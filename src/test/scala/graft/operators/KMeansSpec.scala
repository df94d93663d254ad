package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("fit is deterministic: two runs produce identical centroids") {
    val a = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val b = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    assert(a == b)
    assert(a.size == 4 && a.forall(_.size == 64))
  }

  test("assign picks the argmax-cosine cell, ties to the lowest cell") {
    val cen = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 1)
    val got = KMeans.assign(emb, "embedding", cen)
      .select($"vec_id", $"cell", $"cosine")
      .as[(Long, Int, Double)].collect()
    // brute-force reference on the driver
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    def cos(x: Seq[Double], y: Seq[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      x.indices.foreach { i =>
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i)
      }
      if (nx == 0 || ny == 0) 0.0 else dot / math.sqrt(nx * ny)
    }
    got.foreach { case (id, cell, c) =>
      val v = vecs(id).map(_.toDouble).toSeq
      val sims = cen.map(cos(v, _))
      val best = sims.max
      assert(sims.indexOf(best) == cell, s"vec $id: got $cell want argmax")
      assert(math.abs(best - c) < 1e-9)
    }
  }

  test("iterating improves the spherical objective over the raw seeds") {
    def objective(iters: Int): Double = {
      val cen = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = iters)
      KMeans.assign(emb, "embedding", cen)
        .agg(avg($"cosine")).as[Double].head()
    }
    val o0 = objective(0); val o1 = objective(1); val o2 = objective(2)
    // NOT asserted per-step monotone: the mean update optimizes the
    // Euclidean objective, and with varying member magnitudes a single
    // iteration may legitimately dip the mean-cosine proxy (the
    // cosine-optimal centroid is the sum of NORMALIZED members — review
    // r9). What the operator does promise: trained centroids beat the raw
    // k arbitrary seed vectors, and the whole fit is deterministic
    // (pinned above) with the per-iteration arithmetic oracle-gated in
    // q_kmeans. Assert the robust claims only.
    assert(o1 > o0, s"iter1 $o1 not above seeds $o0")
    assert(o2 > o0, s"iter2 $o2 not above seeds $o0")
    assert(o2 > 0 && o2 <= 1.0 + 1e-9)
  }

  test("empty cells carry their previous centroid forward") {
    // three identical vectors: every row ties at cosine 1.0 with all three
    // seeds, so the ties-low rule sends ALL rows to cell 0 and cells 1..2
    // go empty — fit must keep their seed centroids instead of dropping or
    // index-shifting them (getOrElse branch)
    val dup = Seq.tabulate(3)(i => (i.toLong, Seq.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    val cen = KMeans.fit(dup, "vec_id", "embedding", k = 3, iters = 2)
    assert(cen.size == 3)
    assert(cen.distinct.size == 1) // all equal to the duplicated vector
    val cells = KMeans.assign(dup, "embedding", cen)
      .select($"cell").as[Int].collect().toSet
    assert(cells == Set(0))
  }

  test("assignment is a shuffle-free projection (plan-guarded)") {
    val cen = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 0)
    val plan = KMeans.assign(emb, "embedding", cen)
      .queryExecution.executedPlan.toString
    // centroids are broadcast LITERALS: no join, no exchange, no window —
    // the per-iteration scan cost at 100 TB is the scan and nothing else
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("fit refuses k larger than the row count") {
    val tiny = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      KMeans.fit(tiny, "vec_id", "embedding", k = 2, iters = 1)
    }
  }
}
