package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[ImportanceResample]] on a corpus small enough to count by hand.
  *
  * Bigram counts (α = 0.5): (a b) cr=4/ct=3, (b a) 1/1, (b c) 1/1,
  * (x y) 1/0, (y z) 1/0, (b x) 1/0; T_r=9, T_t=5, V=6.
  */
class ImportanceResampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "a b a b", true),  // target
    (2L, "a b c", true),    // target
    (3L, "x y z", false),   // raw-only, no target overlap
    (4L, "a b x", false),   // raw-only, shares (a b) with the target
    (5L, "q", false)        // too short for a bigram
  ).toDF("doc_id", "text", "is_target")

  private def micro(x: Double): Long = math.floor(1e6 * x).toLong
  private val cMicro = micro(math.log(9 + 0.5 * 6) - math.log(5 + 0.5 * 6))
  private def gMicro(ct: Long, cr: Long): Long =
    micro(math.log(ct + 0.5) - math.log(cr + 0.5))

  private lazy val weights =
    ImportanceResample.logWeights(corpus, "doc_id", "text",
      col("is_target"), n = 2, alpha = 0.5)
  private lazy val byId = weights.collect()
    .map(r => r.getLong(0) -> (r.getAs[Long]("n_grams"), r.getAs[Long]("lw_micro")))
    .toMap

  test("log weights match the hand-computed micro-nat decomposition") {
    assert(byId(1L) === ((3L, 2 * gMicro(3, 4) + 3 * cMicro)))
    assert(byId(2L) === ((2L, gMicro(3, 4) + 2 * cMicro)))
    assert(byId(3L) === ((2L, 2 * gMicro(0, 1) + 2 * cMicro)))
    assert(byId(4L) === ((2L, gMicro(3, 4) + gMicro(0, 1) + 2 * cMicro)))
  }

  test("target docs outrank raw-only docs; overlap outranks disjoint") {
    val lw = byId.view.mapValues(_._2).toMap
    assert(lw(1L) > lw(4L) && lw(2L) > lw(4L), "targets above non-targets")
    assert(lw(4L) > lw(3L), "shared (a b) above disjoint grams")
  }

  test("short docs score 0 with 0 grams instead of dropping out") {
    assert(byId(5L) === ((0L, 0L)))
  }

  test("weights are identical at any partitioning (integer determinism)") {
    val re = ImportanceResample.logWeights(corpus.repartition(7), "doc_id",
        "text", col("is_target"), n = 2, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("lw_micro")).toMap
    assert(re === byId.view.mapValues(_._2).toMap)
  }

  test("gumbel resample is reproducible and weight-biased at low temperature") {
    val docs = (0L until 200L).map { i =>
      val target = i < 50
      (i, if (target) "a b a b c" else "x y z w v", target)
    }.toDF("doc_id", "text", "is_target")
    val w = ImportanceResample.logWeights(docs, "doc_id", "text",
      col("is_target"), n = 2)
    val s1 = ImportanceResample.resampleGumbel(w, "doc_id", "lw_micro",
      k = 40, temperature = 0.01, seed = 7L).collect().map(_.getLong(0)).toSet
    val s2 = ImportanceResample.resampleGumbel(w, "doc_id", "lw_micro",
      k = 40, temperature = 0.01, seed = 7L).collect().map(_.getLong(0)).toSet
    assert(s1 === s2, "same seed → same sample")
    // near-zero temperature: the 40 picks come from the 50 high-weight docs
    assert(s1.forall(_ < 50L), "low temperature ≈ top-k by weight")
    val s3 = ImportanceResample.resampleGumbel(w, "doc_id", "lw_micro",
      k = 40, temperature = 1e9, seed = 7L).collect().map(_.getLong(0)).toSet
    assert(s3.exists(_ >= 50L), "huge temperature ≈ uniform — raw docs appear")
    assert(s3 !== s1)
  }

  test("threshold hatch selects the identical set as the k-heap at every k") {
    val docs = (0L until 300L).map { i =>
      (i, if (i < 80) "a b a b c" else "x y z w v", i < 80)
    }.toDF("doc_id", "text", "is_target")
    val w = ImportanceResample.logWeights(docs, "doc_id", "text",
      col("is_target"), n = 2, alpha = 0.5).localCheckpoint(true)
    // only two distinct lw values → heavy quantized-key tie pressure at
    // the cut, the hardest case for a threshold selection
    for (k <- Seq(1, 10, 59, 60, 61, 150, 299, 300, 500)) {
      val heap = ImportanceResample.resampleGumbel(w, "doc_id", "lw_micro",
        k, temperature = 0.7, seed = 11L).collect().map(_.getLong(0)).toSet
      val thr = ImportanceResample.resampleGumbelThreshold(w, "doc_id",
        "lw_micro", k, temperature = 0.7, seed = 11L)
        .collect().map(_.getLong(0)).toSet
      assert(thr === heap, s"k=$k: threshold path diverged from the heap")
    }
    // the quantile's relativeError only WIDENS the candidate stratum —
    // the selection inside it is the same exact (key desc, id) cut, so
    // any ε must produce the identical sample (r17: the bounded-memory
    // ε>0 form replaced the O(n)-driver ε=0 form on this contract)
    val heap60 = ImportanceResample.resampleGumbel(w, "doc_id", "lw_micro",
      60, temperature = 0.7, seed = 11L).collect().map(_.getLong(0)).toSet
    for (eps <- Seq(1e-4, 1e-2, 0.2)) {
      val thr = ImportanceResample.resampleGumbelThreshold(w, "doc_id",
        "lw_micro", 60, temperature = 0.7, seed = 11L,
        relativeError = eps)
        .collect().map(_.getLong(0)).toSet
      assert(thr === heap60, s"eps=$eps: selection changed with stratum width")
    }
  }

  /** Boundary-margin scan of the ACTUAL `q_dsir_resample` gate keys
    * (ADVICE r15): the gate floors `1e6·(lw/1e6/0.7 + gumbel)` on both
    * engines, and the only cross-engine spread is the `ln` ulps inside
    * the Gumbel transform (the lw micro-nats are integers, the uniform
    * residue is exact rational arithmetic) — error-propagated, that
    * spread is ≲ 1e-7 in key units at these magnitudes. This scans every
    * key the fixed gate corpora produce (same discipline as
    * `UnigramBoundaryMarginSpec`) and asserts a ≥ 1e-5 floor margin,
    * ~100× the spread — a permanent stability proof for the gate, since
    * corpus, seed, k, and temperature are all pinned.
    */
  test("q_dsir_resample gate keys sit >= 1e-5 from every floor boundary (sf0.001 + sf0.01)") {
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.Tables.load(spark, sfDir, "documents")
        .withColumn("doc_id", col("doc_id").cast("long"))
      val w = ImportanceResample.logWeights(docs, "doc_id", "text",
        col("source") === "src18", n = 2, alpha = 0.5)
      val u = greatest(Sampling.uniform(col("doc_id"), 3L), lit(1e-12))
      val keys = w.select(col("doc_id"),
          (lit(1e6) * (col("lw_micro").cast("double") / lit(1e6) / lit(0.7) +
            (-log(-log(u))))).alias("k"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      var worst = Double.MaxValue
      keys.foreach { case (id, k) =>
        val f = k - math.floor(k)
        val m = math.min(f, 1.0 - f)
        assert(m >= 1e-5, s"$sfDir doc $id key $k has floor margin $m")
        worst = math.min(worst, m)
      }
      info(f"$sfDir: ${keys.length} gumbel keys scanned, worst margin $worst%.3e")
    }
  }
}
