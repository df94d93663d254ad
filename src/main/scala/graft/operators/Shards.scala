package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-shard assignment: lay documents out in a deterministic total
  * order and cut the sequence into shards of ~`budget` tokens (contiguous
  * fill — a document straddling a boundary starts the next shard's count;
  * simple, deterministic, and what sequence-packing pipelines actually do
  * before intra-shard shuffling).
  *
  * The running token count is a DISTRIBUTED two-pass prefix sum over ONE
  * pinned partitioning (vs. the naive `Window.orderBy(id)`, which plans a
  * single task holding the entire corpus — the 100 TB killer):
  *   1. range-partition by the order key, sort within partitions, and
  *      MATERIALIZE (lazy localCheckpoint) — pinning the partition
  *      boundaries, which are produced by sampling and would otherwise be
  *      free to differ between two executions of the same subtree;
  *   2. per-partition token totals (a P-row pass over the materialized
  *      blocks) prefix-sum on the driver into per-partition offsets;
  *   3. a map-side cumsum adds each row's offset — no further exchange.
  * Total exchange volume: exactly one range shuffle of the rows. The
  * assignment depends only on the global id order, so the result is
  * identical at any parallelism.
  */
object Shards {

  /** @param df       one row per document
    * @param idCol    unique, totally-ordered key (the layout order)
    * @param tokenCol per-document token count (integral; null counts as 0)
    * @param budget   tokens per shard (> 0)
    * @return df + (cum_before = tokens laid out before this doc,
    *         shard = floor(cum_before / budget))
    */
  def assignByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val parted = df
      .withColumn(tokenCol, col(tokenCol).cast(LongType))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .localCheckpoint(false) // pin the sampled range boundaries: both
                              // passes below MUST see the same partitioning
    val tokIdx = parted.schema.fieldIndex(tokenCol)
    val totals = parted.mapPartitions { rows =>
      var sum = 0L
      rows.foreach(r => if (!r.isNullAt(tokIdx)) sum += r.getLong(tokIdx))
      Iterator.single((TaskContext.getPartitionId(), sum))
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)).collect()
    val offsets = totals.sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) => (pid + 1, acc + tot) }
      .map { case (pid, acc) => pid -> acc }.toMap
    val offB = spark.sparkContext.broadcast(offsets)
    val outSchema = parted.schema
      .add("cum_before", LongType, nullable = false)
      .add("shard", LongType, nullable = false)
    parted.mapPartitions { rows =>
      var cum = offB.value.getOrElse(TaskContext.getPartitionId(), 0L)
      rows.map { r =>
        val n = if (r.isNullAt(tokIdx)) 0L else r.getLong(tokIdx)
        val before = cum
        cum += n
        Row.fromSeq(r.toSeq :+ before :+ before / budget)
      }
    }(Encoders.row(outSchema))
  }
}
