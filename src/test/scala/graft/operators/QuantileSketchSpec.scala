package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val W = 10.0

  test("readout brackets the exact quantile within one bin width") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type", $"value")
    val sk = QuantileSketch.build(ev, "event_type", "value", W)
    val est = QuantileSketch.quantiles(sk, "event_type", W, Seq(0.5, 0.9))
      .as[(String, Double, Double)].collect()
      .map { case (g, q, e) => (g, q) -> e }.toMap
    val exact = ev.groupBy($"event_type").agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .as[(String, Double, Double)].collect()
    exact.foreach { case (g, p50, p90) =>
      assert(est((g, 0.5)) >= p50 - W && est((g, 0.5)) <= p50 + W,
        s"$g p50: est ${est((g, 0.5))} exact $p50")
      assert(est((g, 0.9)) >= p90 - W && est((g, 0.9)) <= p90 + W,
        s"$g p90: est ${est((g, 0.9))} exact $p90")
    }
  }

  test("merge of arbitrary partitions equals a single build") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type", $"value", $"event_id")
    val whole = QuantileSketch.build(ev, "event_type", "value", W)
      .as[(String, Long, Long)].collect().toSet
    val parts = (0 until 3).map(i =>
      QuantileSketch.build(ev.where($"event_id" % 3 === i),
        "event_type", "value", W))
    val merged = QuantileSketch.merge(parts, "event_type")
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("maintain under retract/add equals a from-scratch rebuild") {
    val base = Seq(("a", 5.0, 1L), ("a", 15.0, 2L), ("a", 15.5, 3L),
      ("b", 99.0, 4L)).toDF("g", "v", "k")
    val sk = QuantileSketch.build(base, "g", "v", W)
    // k=2 value moves bins, k=3 deleted (bin count drops), k=4 deleted
    // (group dies), k=5 inserts a new group
    val oldRows = base.where($"k".isin(2L, 3L, 4L))
    val newRows = Seq(("a", 25.0, 2L), ("c", 7.0, 5L)).toDF("g", "v", "k")
    val got = QuantileSketch.maintain(sk, oldRows, newRows, "g", "v", W)
      .as[(String, Long, Long)].collect().toSet
    val finalRows = Seq(("a", 5.0), ("a", 25.0), ("c", 7.0)).toDF("g", "v")
    val want = QuantileSketch.build(finalRows, "g", "v", W)
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
    assert(!got.exists(_._1 == "b")) // emptied group leaves no rows
  }

  test("property: est brackets the discrete quantile within one bin on random data") {
    val rng = new scala.util.Random(97)
    for (trial <- 1 to 5) {
      val rows = Seq.tabulate(200 + trial * 50) { i =>
        (s"g${i % 3}", rng.nextDouble() * 400 - 50) // negatives included
      }
      val df = rows.toDF("g", "v")
      val sk = QuantileSketch.build(df, "g", "v", W)
      val qs = Seq(0.25, 0.5, 0.75, 0.95)
      val est = QuantileSketch.quantiles(sk, "g", W, qs)
        .as[(String, Double, Double)].collect()
        .map { case (g, q, e) => (g, q) -> e }.toMap
      val byGroup = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).sorted
      }
      for ((g, sorted) <- byGroup; q <- qs) {
        // the q-th discrete value lies inside the crossing bin, whose
        // upper edge is the estimate: est - W <= v_q <= est
        val vq = sorted(math.ceil(q * sorted.size).toInt - 1)
        val e = est((g, q))
        assert(e - W <= vq && vq <= e,
          s"trial $trial $g q=$q: est $e does not bracket $vq")
      }
    }
  }

  test("negative values bin downward; q=1.0 lands on the top bin edge") {
    val df = Seq(("g", -5.0), ("g", -15.0), ("g", 5.0)).toDF("g", "v")
    val sk = QuantileSketch.build(df, "g", "v", W)
    val bins = sk.as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(bins == Map(-1L -> 1L, -2L -> 1L, 0L -> 1L))
    val top = QuantileSketch.quantiles(sk, "g", W, Seq(1.0))
      .as[(String, Double, Double)].head()
    assert(top._3 == 10.0) // upper edge of bin 0
  }
}
