package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard assignment: lay documents out in a deterministic total
  * order and cut the sequence into shards of ~`budget` tokens (contiguous
  * fill — a document straddling a boundary starts the next shard's count;
  * simple, deterministic, and what sequence-packing pipelines actually do
  * before intra-shard shuffling).
  *
  * The running token count is a DISTRIBUTED two-pass prefix sum, not a
  * single-partition global window (the naive `Window.orderBy(id)` plans
  * one task holding the entire corpus — the 100 TB killer):
  *   1. range-partition by the order key; per-partition running sums are
  *      an ordinary partitioned window (parallel);
  *   2. per-partition totals (one row each) get a tiny global prefix
  *      window, then broadcast-join back as offsets.
  * Exchange volume: one range shuffle of the rows + P rows of totals.
  * The assignment is independent of the partition boundaries, so the
  * result is identical at any parallelism.
  */
object Shards {

  /** @param df       one row per document
    * @param idCol    unique, totally-ordered key (the layout order)
    * @param tokenCol per-document token count
    * @param budget   tokens per shard (> 0)
    * @return df + (cum_before = tokens laid out before this doc,
    *         shard = floor(cum_before / budget))
    */
  def assignByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val parted = df.repartitionByRange(col(idCol))
      .withColumn("_pid", spark_partition_id())
    val localW = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_local_cum", sum(col(tokenCol)).over(localW))
    val offsetW = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_pid"))
      .agg(sum(col(tokenCol)).alias("_ptotal"))
      .withColumn("_offset", coalesce(sum(col("_ptotal")).over(offsetW), lit(0L)))
      .select(col("_pid"), col("_offset"))
    local.join(broadcast(offsets), "_pid")
      .withColumn("cum_before",
        (col("_offset") + col("_local_cum") - col(tokenCol)).cast("long"))
      .withColumn("shard", floor(col("cum_before") / budget))
      .drop("_pid", "_local_cum", "_offset")
  }
}
