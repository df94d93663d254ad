package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-width-bin quantile sketch — the percentile primitive
  * that survives 100 TB: exact `percentile` sorts every group's values
  * through one task, while this sketch is a bounded (group, bin) count
  * table built in one partial-aggregating shuffle, merged by ADDITION
  * (union + re-sum), maintained under CDC retraction via the same algebra
  * as [[IncrementalAgg.maintainDistinctSupport]], and read out with
  * deterministic integer/IEEE arithmetic — so, unlike t-digest/KLL whose
  * estimates depend on merge order, every number it produces is
  * bit-reproducible and oracle-checkable in SQL. Error is bounded by the
  * bin width (the DDSketch trade with linear instead of logarithmic bins:
  * pick width for the domain; relative-error binning would cost log/pow
  * boundary reproducibility across engines).
  *
  * Readout: quantile q = the upper edge of the first bin whose cumulative
  * count reaches `q * total` (cumulative distribution inversion on bin
  * boundaries). The per-group window runs over |bins| rows, never values.
  */
object QuantileSketch {
  /** (groupCol, bin, n) — bin = floor(value / width), exact in any IEEE
    * engine. Negative values bin downward consistently (floor).
    */
  def build(df: DataFrame, groupCol: String, valueCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.groupBy(col(groupCol),
        floor(col(valueCol) / lit(width)).cast("long").alias("bin"))
      .agg(count(lit(1)).alias("n"))
  }

  /** Merge any number of sketches built with the SAME width: union +
    * re-sum. Addition is associative/commutative — partition layout and
    * merge order cannot change the result.
    */
  def merge(sketches: Seq[DataFrame], groupCol: String): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(col("n")).alias("n"))

  /** Apply one folded CDC batch (retract old rows, add new rows) — the
    * maintainable-histogram form of the support-table algebra.
    */
  def maintain(sketch: DataFrame, oldRows: DataFrame, newRows: DataFrame,
      groupCol: String, valueCol: String, width: Double): DataFrame = {
    val retract = build(oldRows, groupCol, valueCol, width)
      .withColumn("n", -col("n"))
    val add = build(newRows, groupCol, valueCol, width)
    sketch.select(col(groupCol), col("bin"), col("n"))
      .unionByName(retract).unionByName(add)
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(col("n")).alias("n"))
      .where(col("n") > 0)
  }

  /** Quantile readout: for each group and each q in `qs`, the upper edge
    * `(bin + 1) * width` of the first bin whose cumulative count reaches
    * `q * total`. Output: (groupCol, q, est). Deterministic: the cumsum
    * orders by bin id, and min() picks the unique first crossing.
    */
  def quantiles(sketch: DataFrame, groupCol: String, width: Double,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"qs=$qs")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(col(groupCol))))
    val spark = sketch.sparkSession
    import spark.implicits._
    val qDf = broadcast(qs.toDF("q"))
    cum.join(qDf, col("cum") >= col("q") * col("total"))
      .groupBy(col(groupCol), col("q"))
      .agg(((min(col("bin")) + 1) * lit(width)).alias("est"))
  }
}
