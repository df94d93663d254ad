package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // 10k rows of hot key 1 + tail
    val big = ((1 to 10000).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"t$i"))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (999L, "unmatched"))
      .toDF("k", "dim")
    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "dim").except(
      plain.select("k", "payload", "dim")).count() == 0)
    assert(plain.select("k", "payload", "dim").except(
      salted.select("k", "payload", "dim")).count() == 0)
  }

  test("saltedJoin left_outer keeps unmatched big rows exactly once") {
    val big = Seq((1L, "x"), (2L, "y"), (7L, "z")).toDF("k", "payload")
    val small = Seq((1L, "dim1")).toDF("k", "dim")
    val got = Skew.saltedJoin(big, small, Seq("k"), 4, "left_outer")
    assert(got.count() == 3)
    assert(got.where($"dim".isNull).select("k").as[Long].collect().toSet ==
      Set(2L, 7L))
  }

  test("saltedJoin rejects join types that would duplicate unmatched small rows") {
    val big = Seq((1L, "x")).toDF("k", "payload")
    val small = Seq((1L, "dim1"), (9L, "lonely")).toDF("k", "dim")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer"))
      assertThrows[IllegalArgumentException](
        Skew.saltedJoin(big, small, Seq("k"), 4, jt))
    // left_semi stays correct: each big row emitted at most once
    val semi = Skew.saltedJoin(big, small, Seq("k"), 4, "left_semi")
    assert(semi.count() == 1)
  }

  test("keyHistogram surfaces the hot key first") {
    val df = ((1 to 500).map(_ => 42L) ++ Seq(1L, 2L, 3L)).toDF("k")
    val top = Skew.keyHistogram(df, Seq("k"), topN = 1)
      .as[(Long, Long)].head()
    assert(top == ((42L, 500L)))
  }

  test("salt spreads the hot key across partitions") {
    val big = (1 to 5000).map(i => (1L, i)).toDF("k", "v")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(8)).cast("int"))
    val spread = salted.groupBy("_salt").count().count()
    assert(spread >= 6) // hot key lands in ≥6 of 8 salt buckets
  }

  test("AQE splits a skewed sort-merge-join partition (SCALING.md claim)") {
    // one hot key dominating a shuffle partition; thresholds lowered so
    // the tiny test dataset crosses AQE's skew bar
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = ((1 to 60000).map(i => (1L, s"payload_$i")) ++
        (1 to 200).map(i => (i.toLong + 1, s"tail_$i"))).toDF("k", "payload")
      val right = (1 to 300).map(i => (i.toLong, s"dim_$i")).toDF("k", "dim")
      val joined = big.join(right, Seq("k"))
      // execute THIS DataFrame (count() would plan a separate query and
      // leave this one's adaptive plan unfinalized)
      assert(joined.collect().length == 60200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      // the adaptive final plan must have split the hot partition
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
