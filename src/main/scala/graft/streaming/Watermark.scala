package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Commit-order watermark (ST2/ST3): the highest transaction id that can be
  * read without risking phantom or out-of-order commits.
  *
  * Re-expresses `S4HanaProducer.getMaxTransactionId` (`S4HanaProducer.java:
  * 317-368`): read only up to `least(max(logged txid), min(active update
  * txid) - 1)` — never past the oldest uncommitted transaction — with a
  * 2-hour horizon after which a stuck in-flight transaction no longer blocks
  * the stream (`:331`), and latency alerting at >60 s / >5 s open-transaction
  * age (`:346-357`).
  */
object Watermark {

  /** Default in-flight-transaction horizon: 2 h (7200 s). */
  val DefaultHorizonSeconds: Long = 7200

  val WarnAfterSeconds: Long = 60
  val InfoAfterSeconds: Long = 5

  /** An in-flight transaction: id plus its start epoch-second. */
  case class OpenTxn(txid: Long, startEpochSec: Long)

  /** Compute the highest safely readable txid.
    *
    * @param changeLog  the change feed (PKLOG shape) with `txidCol`
    * @param openTxns   currently uncommitted transactions (HANA
    *                   `m_transactions` analog)
    * @param from       the last committed watermark — result never below it
    * @param nowEpochSec current time (injected for determinism)
    */
  def maxSafeTransactionId(changeLog: DataFrame, txidCol: String,
      openTxns: Seq[OpenTxn], from: Long, nowEpochSec: Long,
      horizonSeconds: Long = DefaultHorizonSeconds): Long = {
    val maxLogged = changeLog
      .where(col(txidCol) > from)
      .agg(max(col(txidCol)))
      .head().let(r => if (r.isNullAt(0)) from else r.getLong(0))
    maxSafe(maxLogged, openTxns, from, nowEpochSec, horizonSeconds)
  }

  /** Pure core of the commit-order watermark, for callers that already hold
    * the max logged txid.
    */
  def maxSafe(maxLogged: Long, openTxns: Seq[OpenTxn], from: Long,
      nowEpochSec: Long, horizonSeconds: Long = DefaultHorizonSeconds): Long = {
    val blocking = openTxns
      .filter(t => t.startEpochSec > nowEpochSec - horizonSeconds)
    val minOpenMinus1 = blocking.map(_.txid - 1).minOption.getOrElse(Long.MaxValue)
    math.max(from, math.min(maxLogged, minOpenMinus1))
  }

  /** Latency alert level for the oldest blocking open transaction, mirroring
    * the reference's notification thresholds.
    */
  def latencyAlert(openTxns: Seq[OpenTxn], nowEpochSec: Long): Option[String] = {
    val oldestAge = openTxns.map(t => nowEpochSec - t.startEpochSec).maxOption
    oldestAge.collect {
      case a if a > WarnAfterSeconds => s"WARN: oldest open transaction ${a}s"
      case a if a > InfoAfterSeconds => s"INFO: oldest open transaction ${a}s"
    }
  }

  private implicit class Let[A](private val a: A) extends AnyVal {
    def let[B](f: A => B): B = f(a)
  }
}
