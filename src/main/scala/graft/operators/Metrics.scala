package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Classifier evaluation at corpus scale — the measurement step a curation
  * pipeline runs when it distills an expensive heuristic (or a human
  * labelset) into a cheap filter: does the fast classifier reproduce the
  * reference signal, and where on the score axis does it disagree?
  *
  * Both surfaces are single partial-aggregating passes over (score, label)
  * — exact integer counts first, IEEE ratios derived from the counts at
  * the very end, so results are order-independent and engine-reproducible
  * (the gates hash-match DuckDB replaying the identical arithmetic). No
  * windows, no sorts: a threshold report and a fixed-width calibration
  * histogram are the AUC-free shapes that survive 100 TB (a rank-based
  * AUC needs a global ordering; bin the scores instead and read the
  * tradeoff off the calibration table).
  */
object Metrics {

  /** One-row confusion report at `threshold` (prediction = score >
    * threshold): exact tp/fp/tn/fn counts plus precision/recall/f1/
    * accuracy. Null ratios when undefined (no predicted positives, no
    * actual positives) rather than a silent 0 — an all-negative classifier
    * has no precision, not a bad one.
    *
    * Rows are classified EXHAUSTIVELY: a null score or label cannot be a
    * true or false anything, so such rows land in an explicit `n_null`
    * count instead of silently vanishing from all four cells (which made
    * tp+fp+tn+fn quietly undercount the frame — ADVICE r9). Counts
    * coalesce to 0 on an empty frame (sum over zero rows is null).
    */
  def binaryReport(df: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double): DataFrame = {
    val bad = col(scoreCol).isNull || col(labelCol).isNull
    val pred = col(scoreCol) > lit(threshold)
    val lab = col(labelCol).cast("boolean")
    def cnt(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val counts = df.agg(
      cnt(!bad && pred && lab).alias("tp"),
      cnt(!bad && pred && !lab).alias("fp"),
      cnt(!bad && !pred && !lab).alias("tn"),
      cnt(!bad && !pred && lab).alias("fn"),
      cnt(bad).alias("n_null"))
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0, num.cast(DoubleType) / den.cast(DoubleType))
    val p = ratio(col("tp"), col("tp") + col("fp"))
    val r = ratio(col("tp"), col("tp") + col("fn"))
    counts.select(col("tp"), col("fp"), col("tn"), col("fn"), col("n_null"),
      p.alias("precision"), r.alias("recall"),
      when(p.isNotNull && r.isNotNull && (p + r) > 0,
        lit(2.0) * p * r / (p + r)).alias("f1"),
      ratio(col("tp") + col("tn"),
        col("tp") + col("fp") + col("tn") + col("fn")).alias("accuracy"))
  }

  /** Fixed-width calibration histogram over score range [lo, hi): per bin,
    * total rows, positive rows, and the positive rate. Scores outside the
    * range clamp into the edge bins (they must be counted somewhere — a
    * dropped outlier would silently bias every rate). Bin ids and the rate
    * are plain arithmetic on the counts; only bins that occur appear.
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo")
    val binId = least(greatest(
      floor((col(scoreCol) - lit(lo)) / lit(hi - lo) * bins), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    df.select(binId.alias("bin"), col(labelCol).cast("boolean").alias("_l"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).alias("n"),
        sum(when(col("_l"), 1L).otherwise(0L)).alias("n_pos"))
      .withColumn("pos_rate",
        col("n_pos").cast(DoubleType) / col("n").cast(DoubleType))
  }
}
