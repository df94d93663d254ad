package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def truth(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select(explode(split(lower(trim(col("text"))), "\\s+")).alias("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap

  test("estimates are one-sided and exact when counters don't collide") {
    val docs = Seq("a b a c", "b a", "d d d").toDF("text")
    val sk = FreqSketch.countMin(docs, "text", d = 4, w = 256)
    val est = FreqSketch.estimate(sk, Seq("a", "b", "c", "d", "nope"), 4, 256)
      .as[(String, Long)].collect().toMap
    val t = truth(docs)
    assert(est("a") === t("a") && est("b") === t("b") &&
      est("c") === t("c") && est("d") === t("d"))
    assert(est("nope") === 0L)
  }

  test("tiny width forces collisions: estimates stay ≥ truth, never below") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val sk = FreqSketch.countMin(docs, "text", d = 2, w = 4) // 8 counters
    val t = truth(docs)
    val probes = t.keys.take(20).toSeq
    val est = FreqSketch.estimate(sk, probes, 2, 4)
      .as[(String, Long)].collect().toMap
    probes.foreach { p =>
      assert(est(p) >= t(p), s"$p: est ${est(p)} < true ${t(p)}")
    }
    // with 8 counters over thousands of tokens, SOME estimate must
    // overshoot — otherwise the test exercises nothing
    assert(probes.exists(p => est(p) > t(p)))
  }

  test("merging two corpora's sketches is elementwise addition") {
    val a = Seq("x y", "x").toDF("text")
    val b = Seq("y z").toDF("text")
    val merged = FreqSketch.countMin(a, "text", 3, 64)
      .unionByName(FreqSketch.countMin(b, "text", 3, 64))
      .groupBy("row", "bucket").agg(sum("cnt").alias("cnt"))
    val whole = FreqSketch.countMin(a.unionByName(b), "text", 3, 64)
    assert(merged.as[(Int, Long, Long)].collect().toSet ===
      whole.as[(Int, Long, Long)].collect().toSet)
    // estimates through the merged sketch match the whole-corpus build
    val e1 = FreqSketch.estimate(merged, Seq("x", "y", "z"), 3, 64)
      .as[(String, Long)].collect().toMap
    val e2 = FreqSketch.estimate(whole, Seq("x", "y", "z"), 3, 64)
      .as[(String, Long)].collect().toMap
    assert(e1 === e2)
    assert(e1("x") === 2L && e1("y") === 2L && e1("z") === 1L)
  }

  test("guards: non-power-of-two width and empty probe list refuse") {
    val docs = Seq("a").toDF("text")
    intercept[IllegalArgumentException] {
      FreqSketch.countMin(docs, "text", d = 2, w = 100)
    }
    intercept[IllegalArgumentException] {
      FreqSketch.estimate(FreqSketch.countMin(docs, "text", 2, 64), Nil, 2, 64)
    }
  }
}
