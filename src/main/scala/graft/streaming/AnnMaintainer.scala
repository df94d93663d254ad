package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cdc.Cdc
import graft.operators.AnnIndex

/** Streaming maintenance loop for an IVF / IVF-PQ index (VERDICT r12 #3):
  * the `foreachBatch` sink that keeps a persisted [[AnnIndex]] current
  * from a folded CDC envelope stream — the vector-index analog of
  * [[CdcStreamJob]] maintaining a [[KeyedUpsertStore]], with the SAME
  * maintenance discipline:
  *
  *  - data first, policy after: the batch's tombstones and appends publish
  *    (replay-idempotently, keyed by the micro-batch id) BEFORE any
  *    compaction runs, so a maintenance crash replays the window instead
  *    of losing it;
  *  - debt-driven compaction, not hand-scheduled: the count policy
  *    ([[AnnIndex.compactIvfIfNeeded]]) short-circuits the byte-ratio
  *    policy ([[AnnIndex.compactIvfIfDebtRatio]]) exactly like
  *    `CdcStreamJob.processBatch`'s store maintenance, so a long
  *    append+delete stream keeps its folded-dir debt bounded with no
  *    explicit compact call anywhere in the pipeline;
  *  - lost-race absorption: a policy-triggered compaction that finds its
  *    debt already paid is a no-op inside [[AnnIndex.compactIvf]] itself
  *    (zero remaining delta dirs → return), and a
  *    [[CommitConflictException]] surfacing through a conflict-checked
  *    store front-end is absorbed as "the winner paid the debt" — data
  *    publishes never take this path.
  *
  * Batch shape: the folded envelope — one row per key — with the index's
  * id column, its vector column (plus any build-time attribute columns),
  * and [[Cdc.ChangeType]]. Deletes apply before appends under the same
  * batch id; [[AnnIndex]]'s shared sequence numbering makes a key that is
  * replaced-in-place (delete+re-append across batches) serve its newest
  * vector.
  *
  * {{{
  * val maint = new AnnIndexMaintainer(path, autoCompactDeltas = Some(16))
  * stream.writeStream.foreachBatch(maint.processBatch _).start()
  * }}}
  */
class AnnIndexMaintainer(path: String,
    autoCompactDeltas: Option[Int] = None,
    autoCompactDebtRatio: Option[Double] = None) extends Logging {

  /** Apply one folded CDC micro-batch to the index, then run the
    * compaction policy. Also usable un-streamed (backfills, tests).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val idCol = AnnIndex.indexIdCol(batch.sparkSession, path)
    // delete-batch THEN append-batch under one id (the documented
    // deleteIvfBatch ordering): a crash between the two replays the
    // window — the published half no-ops, the missing half lands
    AnnIndex.deleteIvfBatch(path,
      batch.where(col(Cdc.ChangeType) === Cdc.Delete).select(idCol),
      batchId)
    AnnIndex.appendIvfBatch(path,
      batch.where(col(Cdc.ChangeType) =!= Cdc.Delete)
        .drop(Cdc.ChangeType, Cdc.TransactionId),
      batchId)
    try {
      if (!autoCompactDeltas.exists(AnnIndex.compactIvfIfNeeded(path, _)))
        autoCompactDebtRatio.foreach(AnnIndex.compactIvfIfDebtRatio(path, _))
    } catch {
      case e: CommitConflictException =>
        logInfo(s"batch $batchId: index compaction lost a concurrent-" +
          s"maintenance race, skipped (debt re-checked next batch): " +
          e.getMessage)
    }
  }
}
