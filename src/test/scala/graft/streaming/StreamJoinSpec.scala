package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end [[StreamJoin.intervalJoin]] over MemoryStreams: in-window
  * matches, out-of-window misses, watermark-gated outer emission, and the
  * unbounded-state guard rails.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** (events ⋈ dims) within [l.ts − 10 s, l.ts]: each event enriched by
    * dim changes up to 10 s older, never newer.
    */
  private def run(joinType: String) = {
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Long, Long, String)]
    val dm = MemoryStream[(Long, Long, String)]
    val left = ev.toDF().toDF("user_id", "sec", "action")
      .select(col("user_id"), timestamp_seconds(col("sec")).alias("lts"),
        col("action"))
    val right = dm.toDF().toDF("d_user", "dsec", "segment")
      .select(col("d_user"), timestamp_seconds(col("dsec")).alias("rts"),
        col("segment"))
    val joined = StreamJoin.intervalJoin(left, right,
      "user_id", "d_user", "lts", "rts",
      leftDelay = "5 seconds", rightDelay = "5 seconds",
      before = "10 seconds", after = "0 seconds", joinType = joinType)
    val name = s"sj_$joinType"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    (ev, dm, q, name)
  }

  test("inner: matches inside the interval, not outside") {
    val (ev, dm, q, name) = run("inner")
    try {
      dm.addData((1L, 5L, "gold"), (1L, 40L, "silver"), (2L, 90L, "bronze"))
      ev.addData((1L, 10L, "click"), // dim at 5 is 5s older → match gold
        (1L, 45L, "buy"),            // dim at 40 → match silver, 5 too old
        (2L, 85L, "view"))           // dim at 90 is NEWER → no match
      q.processAllAvailable()
      val got = spark.table(name)
        .select(col("user_id"), col("action"), col("segment"))
        .as[(Long, String, String)].collect().toSet
      assert(got === Set((1L, "click", "gold"), (1L, "buy", "silver")))
    } finally q.stop()
  }

  test("a left row joins EVERY in-window right row (interval, not as-of)") {
    val (ev, dm, q, name) = run("inner")
    try {
      dm.addData((7L, 100L, "a"), (7L, 104L, "b"))
      ev.addData((7L, 105L, "click"))
      q.processAllAvailable()
      assert(spark.table(name).select(col("segment"))
        .as[String].collect().toSet === Set("a", "b"))
    } finally q.stop()
  }

  test("leftOuter: unmatched left emits nulls only after the watermark") {
    val (ev, dm, q, name) = run("leftOuter")
    try {
      ev.addData((3L, 50L, "orphan"))
      dm.addData((4L, 50L, "x")) // advances the right watermark only to 45
      q.processAllAvailable()
      val before = spark.table(name)
        .where(col("action") === "orphan").count()
      assert(before === 0L, "outer result must wait for the watermark")
      // push BOTH watermarks far past 50 + interval; the no-match is proven
      ev.addData((99L, 300L, "tick"))
      dm.addData((98L, 300L, "tick"))
      q.processAllAvailable()
      ev.addData((99L, 310L, "tick2")) // one more batch to flush state
      dm.addData((98L, 310L, "tick2"))
      q.processAllAvailable()
      val orphan = spark.table(name).where(col("action") === "orphan")
        .select(col("segment")).collect()
      assert(orphan.length === 1 && orphan.head.isNullAt(0),
        "unmatched left row emits exactly once, null-extended")
    } finally q.stop()
  }

  test("guard rails: ambiguous column names and bad join types refuse") {
    val df = Seq((1L, ts(0), "x")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(df, df, "k", "k", "t", "t2", "1 second",
        "1 second")
    }
    intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(df, df, "k", "k2", "t", "t2", "1 second",
        "1 second", joinType = "fullOuter")
    }
  }
}
