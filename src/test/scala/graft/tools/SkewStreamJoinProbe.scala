package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Wall-clock measurement of [[graft.streaming.StreamJoin
  * .saltedIntervalJoin]] vs the unsalted join under hot-key skew — the
  * time-domain companion to StreamJoinSpec's partition-histogram table
  * (SCALING §25): 90% of a 200k-row fact stream on ONE key means the
  * unsalted stream-stream join funnels 180k rows through a single
  * state-store partition's task per micro-batch while 31 cores idle;
  * salting ×8 splits that task eight ways. local[32], 32 shuffle
  * partitions (the production setting), one big micro-batch each, fresh
  * streams per variant, salted-first ordering so JVM warmup favors the
  * UNSALTED side (bias against the claim).
  *
  * Run: `sbt "Test/runMain graft.tools.SkewStreamJoinProbe [leftRows]"`.
  */
object SkewStreamJoinProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 90% of events on key 1, ts uniform over [0, 100) s; dims: 10 hot
    // changes every 10 s plus a few cold keys — every event sees ≤ 2
    // in-window dims (output stays ~O(left))
    val events = (0 until n).map { i =>
      val k = if (i % 10 == 0) (i / 10) % 50 + 2L else 1L
      (k, (i % 100).toLong * 1000L + i % 1000L, i.toLong)
    }
    val dims = (0 until 10).map(k => (1L, k * 10000L, 1000L + k)) ++
      (0 until 50).map(k => (k + 2L, 50000L, 2000L + k))

    def run(label: String, salted: Boolean): (Double, Long) = {
      val ev = MemoryStream[(Long, Long, Long)]
      val dm = MemoryStream[(Long, Long, Long)]
      val left = ev.toDF().toDF("k", "ms", "eid")
        .select(col("k"), timestamp_millis(col("ms")).alias("lts"), col("eid"))
      val right = dm.toDF().toDF("dk", "dms", "did")
        .select(col("dk"), timestamp_millis(col("dms")).alias("rts"),
          col("did"))
      def joinOf(l: DataFrame, r: DataFrame) =
        if (salted) graft.streaming.StreamJoin.saltedIntervalJoin(l, r,
          "k", "dk", "lts", "rts", "5 seconds", "5 seconds",
          before = "10 seconds", after = "0 seconds", saltFactor = 8)
        else graft.streaming.StreamJoin.intervalJoin(l, r,
          "k", "dk", "lts", "rts", "5 seconds", "5 seconds",
          before = "10 seconds", after = "0 seconds")
      val q = joinOf(left, right).select(col("eid"), col("did"))
        .writeStream.format("memory").queryName(s"skewprobe_$label")
        .outputMode("append").start()
      try {
        dm.addData(dims: _*)
        ev.addData(events: _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, spark.table(s"skewprobe_$label").count())
      } finally q.stop()
    }

    // warmup both paths on a small batch, then salted FIRST (any residual
    // warmup advantage then helps the unsalted side — bias against us)
    run("w1", salted = false); run("w2", salted = true)
    val (ts1, c1) = run("salted", salted = true)
    val (tu1, c2) = run("unsalted", salted = false)
    val (ts2, c3) = run("salted2", salted = true)
    val (tu2, c4) = run("unsalted2", salted = false)
    require(Set(c1, c2, c3, c4).size == 1,
      s"variants disagree on the result count: $c1 $c2 $c3 $c4")
    println(f"rows=$n matches=$c1")
    println(f"salted_s=$ts1%.2f salted2_s=$ts2%.2f")
    println(f"unsalted_s=$tu1%.2f unsalted2_s=$tu2%.2f")
    spark.stop()
  }
}
