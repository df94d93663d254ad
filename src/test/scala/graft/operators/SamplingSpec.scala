package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling/mixing: partition-invariance (the property
  * rand(seed) lacks), quota exactness, rate accuracy, plan shape.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 2000L).map(i => (i, s"s${i % 5}"))
    .toDF("id", "stratum")

  test("bernoulli: deterministic and partition-invariant, rate within 2%") {
    val a = Sampling.bernoulli(docs, "id", 0.25, seed = 3L)
      .select("id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs.repartition(13), "id", 0.25, seed = 3L)
      .select("id").as[Long].collect().toSet
    assert(a == b) // repartition must not change the sample
    assert(math.abs(a.size / 2000.0 - 0.25) < 0.02)
    // a different seed draws a different sample
    val c = Sampling.bernoulli(docs, "id", 0.25, seed = 4L)
      .select("id").as[Long].collect().toSet
    assert(a != c)
  }

  test("quotaPerStratum: exact quota, stable under repartition") {
    val got = Sampling.quotaPerStratum(docs, "id", "stratum", 50, seed = 1L)
    val perStratum = got.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(perStratum.values.toSet == Set(50L))
    val again = Sampling
      .quotaPerStratum(docs.repartition(7), "id", "stratum", 50, seed = 1L)
    assert(got.select("id").as[Long].collect().toSet ==
      again.select("id").as[Long].collect().toSet)
    // a stratum smaller than the quota survives whole
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "stratum")
    assert(Sampling.quotaPerStratum(tiny, "id", "stratum", 50).count() == 2)
    // the non-broadcast escape hatch picks the identical rows
    val noBc = Sampling.quotaPerStratum(docs, "id", "stratum", 50, seed = 1L,
      broadcastPicked = false)
    assert(noBc.select("id").as[Long].collect().toSet ==
      got.select("id").as[Long].collect().toSet)
  }

  test("uniform: no small-period aliasing; NULL stratum keeps its quota") {
    // ids congruent mod one prime must still differ via the second residue
    // (a single (id % p) * K hash would alias them — review finding r7)
    val p1 = 2147483629L
    val ids = (0L until 8L).map(k => 123L + k * p1).toDF("id")
    val hashes = ids.select(Sampling.uniform(col("id"), 0L).as("u"))
      .as[Double].collect().toSet
    assert(hashes.size == 8, s"aliased hashes: $hashes")
    // NULL is a legitimate stratum: quota must not null-kill the semi-join
    val withNull = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, None))
      .toDF("id", "stratum")
    val got = Sampling.quotaPerStratum(withNull, "id", "stratum", 1, seed = 2L)
    assert(got.count() == 2) // one pick for "a", one for NULL
    assert(got.where(col("stratum").isNull).count() == 1)
  }

  test("mix: per-stratum rates hold; absent strata use the default") {
    val got = Sampling.mix(docs, "id", "stratum",
      Map("s0" -> 0.0, "s1" -> 1.0), defaultRate = 0.5, seed = 9L)
    val n = got.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(!n.contains("s0"))       // rate 0 drops everything
    assert(n("s1") == 400L)         // rate 1 keeps all 400
    Seq("s2", "s3", "s4").foreach { s =>
      assert(math.abs(n(s) / 400.0 - 0.5) < 0.08, s"$s -> ${n(s)}")
    }
  }

  test("plan shape: bernoulli/mix are map-side filters, quota is a bounded partial agg") {
    val bPlan = Sampling.bernoulli(docs, "id", 0.5).queryExecution
      .executedPlan.toString
    assert(!bPlan.contains("Exchange"), bPlan)
    val mPlan = Sampling.mix(docs, "id", "stratum", Map("s1" -> 0.9), 0.5)
      .queryExecution.executedPlan.toString
    assert(!mPlan.contains("Exchange"), mPlan)
    // the quota pick must be a heap aggregation, never a per-stratum sort
    // (a hot stratum through one task's window sort is the q_w1 bug again)
    val qPlan = Sampling.quotaPerStratum(docs, "id", "stratum", 10)
      .queryExecution.executedPlan.toString
    assert(!qPlan.contains("Window"), qPlan)
    assert(qPlan.contains("ObjectHashAggregate") || qPlan.contains("SortAggregate"), qPlan)
  }
}
