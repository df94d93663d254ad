package graft.util

import org.apache.spark.sql.DataFrame

/** Block-manager hygiene for `localCheckpoint`'d frames.
  *
  * `Dataset.unpersist` is a cache-manager call: it clears entries the
  * CACHE manager registered and does nothing to the RDD a local
  * checkpoint materialized, so checkpoint blocks are freed only when the
  * driver GC collects the RDD reference (ADVICE r16 — the maintainer's
  * per-batch `fresh.unpersist()` was a silent no-op). A long-running
  * foreachBatch stream that checkpoints per batch would pin every
  * batch's blocks until a GC happens to run; on a 1000-executor cluster
  * that is real memory held for no reason.
  */
object Checkpoints {

  /** Proactively free the blocks behind a localCheckpoint'd frame by
    * unpersisting the checkpointed RDDs at the plan's leaves. The frame
    * (and anything lazily derived from it) MUST NOT be computed again
    * afterwards — the checkpoint truncated its lineage, so the blocks
    * are the only copy. Safe on non-checkpointed frames (no LogicalRDD
    * leaf → no-op).
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ =>
    }
}
