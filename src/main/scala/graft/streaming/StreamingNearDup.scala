package graft.streaming

import graft.functions.GraftExpressions.{minhash_signature, shingle_hashes}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Streaming MinHash-LSH near-duplicate detection: flag each incoming
  * document against the documents ALREADY SEEN by the stream — the
  * continuous-ingest form of [[graft.operators.Dedup.minhashNearDups]]
  * (a crawler frontier or CDC document feed deduplicating against its own
  * history, without re-running the batch join over the full corpus every
  * micro-batch).
  *
  * Same sketch, same banding as the batch path: a k-hash MinHash
  * signature per document, split into `bands` band hashes. State lives
  * per (band, band_hash) bucket — id + signature for up to `maxBucket`
  * members — so an arriving document compares against EXACTLY its bucket
  * mates, never the corpus. A pair agreeing in several bands emits one
  * hit per agreeing band (at-least-once by design: suppressing the
  * duplicates would need a second stateful stage keyed by pair); hits are
  * identical rows, so a downstream `dropDuplicates` or any idempotent
  * sink collapses them.
  *
  * Scale: each micro-batch shuffles only its own rows (bands × batch
  * rows, 8-byte keys); bucket state is bounded by `maxBucket` and
  * expirable by `stateTtl` (the dedup horizon — at 100 TB/month you
  * near-dup against a sliding window, not all history). A hot boilerplate
  * bucket saturates at `maxBucket` members and stops growing — the same
  * explicit cap as the batch candidates path, and the documented recall
  * trade.
  */
object StreamingNearDup {

  /** One banded signature row on the wire. */
  case class BandedDoc(docId: Long, band: Int, bandHash: Long, sig: Seq[Long])

  /** Bucket state: member ids + their full signatures, insertion-ordered,
    * capped at `maxBucket`.
    */
  case class Bucket(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** An emitted near-dup hit: `docId` arrived and agreed with historical
    * `matchId` on `jaccardEst` of signature positions (the MinHash
    * estimator of Jaccard similarity).
    */
  case class Hit(docId: Long, matchId: Long, jaccardEst: Double)

  /** Banded signatures for a (possibly streaming) document frame —
    * identical construction to the batch `lshBuckets`: k-hash MinHash
    * over `shingleN`-gram shingles, `bands` contiguous slices, each
    * xxhash64-folded with its band index as seed. Documents too short to
    * shingle are dropped (they have no signature to compare).
    */
  def bandedSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int): Dataset[BandedDoc] = {
    val rowsPerBand = k / bands
    require(rowsPerBand * bands == k, s"bands ($bands) must divide k ($k)")
    implicit val enc = Encoders.product[BandedDoc]
    docs
      .select(col(idCol).cast(LongType).alias("docId"),
        shingle_hashes(col(textCol), shingleN).alias("_sh"))
      .where(size(col("_sh")) > 0)
      .select(col("docId"), minhash_signature(col("_sh"), k).alias("sig"))
      .select(col("docId"), col("sig"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          i => xxhash64(slice(col("sig"), i * rowsPerBand + 1, lit(rowsPerBand)), i))))
      .select(col("docId"), col("pos").alias("band"),
        col("col").alias("bandHash"), col("sig"))
      .as[BandedDoc]
  }

  /** The stateful core: near-dup hits of each arriving document against
    * the stream's history (earlier micro-batches, and earlier-id documents
    * of the same batch — batch rows are folded in ascending docId order,
    * so the LARGER id of a same-batch pair reports the smaller as its
    * match, deterministically). Re-deliveries of an id already in the
    * bucket are skipped as self-matches, so replays don't self-report.
    *
    * @param stateTtl processing-time retention per bucket (the dedup
    *                 horizon), e.g. "30 days"; empty = keep forever and
    *                 run timeout-free (see [[StatefulDedup.latestPerKey]]
    *                 on why the timeout only arms when a TTL is set)
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, k: Int = 48, bands: Int = 12,
      threshold: Double = 0.7, maxBucket: Int = 64,
      stateTtl: String = ""): Dataset[Hit] = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    implicit val hitEnc = Encoders.product[Hit]
    implicit val stateEnc = Encoders.product[Bucket]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    val timeoutConf =
      if (stateTtl.nonEmpty) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    bandedSignatures(docs, idCol, textCol, shingleN, k, bands)
      .groupByKey(b => (b.band, b.bandHash))
      .flatMapGroupsWithState[Bucket, Hit](OutputMode.Append(), timeoutConf) {
        (_, rows: Iterator[BandedDoc], state: GroupState[Bucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var bucket = state.getOption.getOrElse(Bucket(Nil, Nil))
            val hits = Seq.newBuilder[Hit]
            rows.toSeq.sortBy(_.docId).foreach { d =>
              var i = 0
              while (i < bucket.ids.length) {
                if (bucket.ids(i) != d.docId) {
                  val other = bucket.sigs(i)
                  var agree = 0
                  var j = 0
                  while (j < d.sig.length) {
                    if (d.sig(j) == other(j)) agree += 1
                    j += 1
                  }
                  val est = agree.toDouble / d.sig.length
                  if (est >= threshold) hits += Hit(d.docId, bucket.ids(i), est)
                }
                i += 1
              }
              if (bucket.ids.length < maxBucket && !bucket.ids.contains(d.docId))
                bucket = Bucket(bucket.ids :+ d.docId, bucket.sigs :+ d.sig)
            }
            state.update(bucket)
            if (stateTtl.nonEmpty && state.exists)
              state.setTimeoutDuration(stateTtl)
            hits.result().iterator
          }
      }
  }
}
