package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end streaming near-dup: MemoryStream document feed → banded
  * MinHash state → hits against stream history only.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "again and again in the quiet yard tonight"
  private val variant = base + " under bright stars"
  private val other = "completely different content about spark shuffles " +
    "and parquet readers operating at corpus scale"

  private def startQuery(ms: MemoryStream[(Long, String)], name: String,
      threshold: Double = 0.5, maxBucket: Int = 64) = {
    val hits = StreamingNearDup.pairs(ms.toDF().toDF("doc_id", "text"),
      "doc_id", "text", threshold = threshold, maxBucket = maxBucket)
    hits.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
  }

  test("near-dup found across micro-batches; replay never self-reports") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = startQuery(ms, "nd_hits")
    try {
      ms.addData((1L, base), (2L, other))
      q.processAllAvailable()
      assert(spark.table("nd_hits").count() === 0,
        "dissimilar same-batch docs must not hit")

      ms.addData((3L, variant))
      q.processAllAvailable()
      val got = spark.table("nd_hits").as[StreamingNearDup.Hit].collect()
      assert(got.nonEmpty, "variant must hit its historical original")
      assert(got.forall(h => h.docId == 3L && h.matchId == 1L), got.toSeq)
      assert(got.forall(_.jaccardEst >= 0.5))

      // replay: doc 3 is in its buckets now — must match 1 again
      // (at-least-once), never itself
      ms.addData((3L, variant))
      q.processAllAvailable()
      val replayed = spark.table("nd_hits").as[StreamingNearDup.Hit].collect()
      assert(replayed.forall(h => h.docId == 3L && h.matchId == 1L),
        s"self-match leaked: ${replayed.toSeq}")
    } finally q.stop()
  }

  test("same-batch pair: the larger id reports the smaller, once per band") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = startQuery(ms, "nd_samebatch")
    try {
      ms.addData((7L, base), (5L, base))
      q.processAllAvailable()
      val got = spark.table("nd_samebatch").as[StreamingNearDup.Hit].collect()
      assert(got.nonEmpty)
      assert(got.toSet === Set(StreamingNearDup.Hit(7L, 5L, 1.0)),
        s"expected only (7 → 5) identical-signature hits: ${got.toSeq}")
      assert(got.length === 12, "identical docs agree in every band")
    } finally q.stop()
  }

  test("maxBucket caps bucket membership (and therefore state growth)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = startQuery(ms, "nd_capped", maxBucket = 1)
    try {
      ms.addData((1L, base))
      q.processAllAvailable()
      ms.addData((2L, base))
      q.processAllAvailable()
      ms.addData((3L, base))
      q.processAllAvailable()
      val got = spark.table("nd_capped").as[StreamingNearDup.Hit].collect()
      // docs 2 and 3 both match the sole stored member 1; 2 was never
      // admitted, so (3, 2) cannot exist
      assert(got.map(h => (h.docId, h.matchId)).toSet ===
        Set((2L, 1L), (3L, 1L)), got.toSeq)
    } finally q.stop()
  }

  test("short documents (no shingles) pass through silently") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = startQuery(ms, "nd_short")
    try {
      // shingles are CHARACTER 5-grams: below 5 chars there is no sketch
      ms.addData((1L, "hi"), (2L, "hi"))
      q.processAllAvailable()
      assert(spark.table("nd_short").count() === 0)
    } finally q.stop()
  }
}
