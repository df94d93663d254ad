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
    intercept[IllegalArgumentException] {
      StreamJoin.saltedIntervalJoin(df, df, "k", "k2", "t", "t2",
        "1 second", "1 second", saltFactor = 1)
    }
  }

  test("salted interval join is row-identical to the batch interval join under 90% hot-key skew") {
    implicit val sqlCtx = spark.sqlContext
    // 90 events on the hot user, 10 spread; dims for hot + a few others
    val events = (0 until 90).map(i => (1L, 100L + i, s"e$i")) ++
      (0 until 10).map(i => ((i + 2).toLong, 120L + i, s"s$i"))
    // hot dims every 10 s so most hot events see an in-window dim change
    val dims = (0 until 6).map(k => (1L, 95L + 10 * k, s"hot$k")) ++
      Seq((3L, 118L, "d3"), (99L, 400L, "late"))
    val ev = MemoryStream[(Long, Long, String)]
    val dm = MemoryStream[(Long, Long, String)]
    val left = ev.toDF().toDF("user_id", "sec", "action")
      .select(col("user_id"), timestamp_seconds(col("sec")).alias("lts"),
        col("action"))
    val right = dm.toDF().toDF("d_user", "dsec", "segment")
      .select(col("d_user"), timestamp_seconds(col("dsec")).alias("rts"),
        col("segment"))
    val q = StreamJoin.saltedIntervalJoin(left, right,
        "user_id", "d_user", "lts", "rts",
        leftDelay = "5 seconds", rightDelay = "5 seconds",
        before = "10 seconds", after = "0 seconds", saltFactor = 8)
      .writeStream.format("memory").queryName("sj_salted")
      .outputMode("append").start()
    try {
      dm.addData(dims: _*)
      ev.addData(events: _*)
      q.processAllAvailable()
      val got = spark.table("sj_salted")
        .select(col("user_id"), col("action"), col("segment"))
        .as[(Long, String, String)].collect().toSeq
      // the oracle is the BATCH join under the identical condition — the
      // salt must be invisible in the result (each pair meets in exactly
      // one bucket: no loss, no duplication, hot key included)
      val lb = events.toDF("user_id", "sec", "action")
        .select(col("user_id"), timestamp_seconds(col("sec")).alias("lts"),
          col("action"))
      val rb = dims.toDF("d_user", "dsec", "segment")
        .select(col("d_user"), timestamp_seconds(col("dsec")).alias("rts"),
          col("segment"))
      val want = lb.join(rb, col("user_id") === col("d_user") &&
          col("rts") >= col("lts") - expr("interval 10 seconds") &&
          col("rts") <= col("lts"), "inner")
        .select(col("user_id"), col("action"), col("segment"))
        .as[(Long, String, String)].collect().toSeq
      assert(got.sorted == want.sorted)
      assert(want.count(_._1 == 1L) >= 40,
        "fixture regression: the hot key no longer dominates the matches")
    } finally q.stop()
  }

  test("salted leftOuter: the unreplicated left side emits unmatched rows exactly once, null-extended") {
    // the replication-safety claim made concrete: the RIGHT side exists
    // saltFactor times, so an outer row emitted per replica would show up
    // 8×; the LEFT side is never replicated, so its unmatched rows must
    // appear exactly once after the watermark proves no match
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Long, Long, String)]
    val dm = MemoryStream[(Long, Long, String)]
    val left = ev.toDF().toDF("user_id", "sec", "action")
      .select(col("user_id"), timestamp_seconds(col("sec")).alias("lts"),
        col("action"))
    val right = dm.toDF().toDF("d_user", "dsec", "segment")
      .select(col("d_user"), timestamp_seconds(col("dsec")).alias("rts"),
        col("segment"))
    val q = StreamJoin.saltedIntervalJoin(left, right,
        "user_id", "d_user", "lts", "rts",
        leftDelay = "5 seconds", rightDelay = "5 seconds",
        before = "10 seconds", after = "0 seconds",
        joinType = "leftOuter", saltFactor = 8)
      .writeStream.format("memory").queryName("sj_salted_outer")
      .outputMode("append").start()
    try {
      ev.addData((3L, 50L, "orphan"), (5L, 50L, "matched"))
      dm.addData((5L, 45L, "seg5"))
      q.processAllAvailable()
      // flush both watermarks far past the interval, twice (watermark is
      // computed from the PREVIOUS batch's max event time)
      Seq(300L, 310L).foreach { t =>
        ev.addData((99L, t, "tick")); dm.addData((98L, t, "tick"))
        q.processAllAvailable()
      }
      val matched = spark.table("sj_salted_outer")
        .where(col("action") === "matched").select(col("segment"))
        .as[String].collect().toSeq
      assert(matched == Seq("seg5"),
        s"matched row must join exactly once across replicas, got $matched")
      val orphan = spark.table("sj_salted_outer")
        .where(col("action") === "orphan").select(col("segment")).collect()
      assert(orphan.length == 1 && orphan.head.isNullAt(0),
        s"unmatched left row must emit exactly once null-extended, got " +
          s"${orphan.length} rows")
    } finally q.stop()
  }

  test("salting bounds the per-partition key concentration the unsalted join pins to one state store") {
    // Structured Streaming hash-clusters stream-stream join state on the
    // join keys — the same HashPartitioning family as repartition(n, keys)
    // — so the batch partition histogram IS the state/processing
    // concentration measure. 90% of rows on one key, 32 partitions (the
    // production shuffle-partition setting): unsalted, the hot key's rows
    // land in ONE partition; salted ×8, the max partition holds ~1/8.
    val n = 10000L
    val df = spark.range(n).select(
      when(col("id") % 10 === 0, col("id") / 10 + 2).otherwise(1L)
        .cast("long").alias("k"),
      col("id"))
    def maxPart(parted: org.apache.spark.sql.DataFrame): Long =
      parted.groupBy(spark_partition_id()).count()
        .agg(max("count")).head().getLong(0)
    val hot = df.where(col("k") === 1L).count() // 9000
    val unsalted = maxPart(df.repartition(32, col("k")))
    val salted = maxPart(df
      .withColumn("_salt", pmod(xxhash64(col("k"), col("id")), lit(8))
        .cast("int"))
      .repartition(32, col("k"), col("_salt")))
    assert(unsalted >= hot,
      s"expected the hot key ($hot rows) to pin one partition, got $unsalted")
    // 8 salt buckets hashed into 32 partitions collide (birthday) — two
    // hot-key buckets can share a partition, so the honest bound is ~2/8
    // of the hot key plus small-key noise, still a ≥3× spread
    assert(salted <= unsalted / 3,
      s"salting failed to spread the hot key: max partition $salted vs " +
        s"unsalted $unsalted")
    info(s"hot=$hot unsaltedMaxPartition=$unsalted saltedMaxPartition=$salted")
  }
}
