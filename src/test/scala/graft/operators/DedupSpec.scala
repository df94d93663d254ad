package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 0/1 exact dups; 2/3 near-dups (1 word changed);
  // 4 unique; 5/6 near-dup pair with small edit
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
    (2L, "spark executes queries with catalyst optimizer and tungsten engine for speed"),
    (3L, "spark executes queries with catalyst optimizer and tungsten engine for speedy"),
    (4L, "completely unrelated document about cooking recipes and kitchen equipment lists"),
    (5L, "large language models train on deduplicated web corpora for better quality"),
    (6L, "large language models train on deduplicated web corpora for better qualities")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val got = Dedup.exact(docs, "doc_id", "text")
    assert(got.count() == 6) // 7 docs, one exact pair
    val dup = got.where($"n_copies" === 2).select("keep_id").as[Long].collect()
    assert(dup.toSeq == Seq(0L))
  }

  test("minhash LSH finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 5, k = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
    assert(pairs.contains((5L, 6L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard verify: exact pair has jaccard 1.0") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val cands = Dedup.minhashCandidates(sigs, "doc_id")
    val j = Dedup.jaccardVerify(cands, docs, "doc_id", "text", threshold = 0.0)
      .where($"id_a" === 0 && $"id_b" === 1).select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash near-dup finds planted pairs via pigeonhole banding") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("embedding near-dup finds near-identical vectors only") {
    val vecs = Seq(
      (0L, Array.tabulate(16)(i => math.sin(i.toDouble).toFloat)),
      (1L, Array.tabulate(16)(i => math.sin(i.toDouble).toFloat * 1.001f)),
      (2L, Array.tabulate(16)(i => math.cos(i * 2.0 + 1).toFloat))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
        dim = 16, threshold = 0.999, numPlanes = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("banded LSH near-dup: recall 1.0 vs the exact baseline on the real corpus") {
    // the fused-dedup gate runs this LSH parameterization (4 planes × 48
    // seeded tables — the r7 sweep's cheapest recall-1.0 point at BOTH
    // sf0.01 and sf0.1; see tools/LshSweep + SCALING.md); embeddingExactPairs
    // is the ground-truth baseline — measured recall MUST be 1.0 or the
    // oracle-gated fused query goes red
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.embeddingExactPairs(real, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDups(real, "vec_id", "embedding",
        dim = 64, threshold = 0.4, numPlanes = 4, tables = 48)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "baseline found no pairs — corpus changed?")
    assert(lsh == exact,
      s"LSH missed ${(exact -- lsh).size} / found ${lsh.size} vs exact ${exact.size}")
  }

  test("banded LSH plan guard: no nested-loop join anywhere in the pipeline") {
    // the quadratic marker: embeddingExactPairs plans a
    // BroadcastNestedLoopJoin (documented O(n²) baseline); the LSH path
    // must never contain one — its pairing is bucket-local by construction
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Dedup.embeddingNearDups(real, "vec_id", "embedding",
      dim = 64, threshold = 0.4, numPlanes = 4, tables = 48)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    val exactPlan = Dedup.embeddingExactPairs(real, "vec_id", "embedding", 0.4)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("BroadcastNestedLoop")) // the baseline IS the block join
  }

  test("minhash candidates: no quadratic blowup — bucket cap filters degenerate buckets") {
    // 50 identical docs would form a 50-wide bucket in every band
    val many = (0L until 50L).map(i => (i, "same same same same same text"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(many, "doc_id", "text")
    val capped = Dedup.minhashCandidates(sigs, "doc_id", maxBucket = 10)
    assert(capped.count() == 0) // all buckets over cap → dropped
    val uncapped = Dedup.minhashCandidates(sigs, "doc_id", maxBucket = 1000)
    assert(uncapped.count() == 50L * 49 / 2)
  }

  test("estimated Jaccard tracks exact Jaccard on candidates") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val cands = Dedup.minhashCandidates(sigs, "doc_id")
    val exact = Dedup.jaccardVerify(cands, docs, "doc_id", "text", threshold = 0.0)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val est = Dedup.estimatedJaccardVerify(cands, sigs, "doc_id", threshold = 0.0)
      .select($"id_a", $"id_b", $"jaccard_est").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (pair, e) =>
      assert(math.abs(e - exact(pair)) < 0.15, s"$pair est=$e exact=${exact(pair)}")
    }
  }

  test("connectedComponents: transitive groups labeled by min id (both paths)") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),          // chain {1,2,3}
      (10L, 11L),                   // pair {10,11}
      (20L, 21L), (21L, 22L), (20L, 22L) // triangle {20,21,22}
    ).toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    // driver union-find fast path
    assert(Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap == want)
    // distributed pointer-jumping path (forced)
    assert(Dedup.connectedComponents(pairs, driverEdgeLimit = 0)
      .as[(Long, Long)].collect().toMap == want)
  }

  test("connectedComponents converges on a long chain (diameter test, both paths)") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    for (limit <- Seq(0L, Long.MaxValue)) {
      val got = Dedup.connectedComponents(chain, maxIterations = 50,
        driverEdgeLimit = limit)
        .as[(Long, Long)].collect()
      assert(got.forall(_._2 == 0L), s"limit=$limit")
      assert(got.length == 31, s"limit=$limit")
    }
  }

  test("connectedComponents handles string ids (distributed path, no long cast)") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("simhash maxHamming=0: exact-fingerprint pairs (64-bit mask edge)") {
    val df = Seq(
      (0L, "same text here exactly"), (1L, "same text here exactly"),
      (2L, "totally different words altogether")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("ngramJaccardJoin: prefix filtering equals brute-force all-pairs (exact)") {
    import graft.functions.GraftExpressions._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (t <- Seq(0.3, 0.8)) {
      val got = Dedup.ngramJaccardJoin(real, "doc_id", "text", 5, t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sh = real.select($"doc_id", shingle_hashes($"text", 5).as("sh"))
      val want = sh.alias("a").join(sh.alias("b"), $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          jaccard_sorted($"a.sh", $"b.sh").as("j"))
        .where($"j" >= t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == want, s"threshold $t: prefix filter missed or added pairs")
    }
  }

  test("ngramJaccardJoin boundary: t·n an exact integer keeps full recall (ADVICE r2)") {
    // J(A,B) = 40/50 = 0.8 exactly, with t·n landing on exact integers
    // (0.8·40 = 32, 0.8·50 = 40): a float-ceil overshoot would shrink the
    // prefix by one token and can drop the pair
    val wordsA = (1 to 40).map(i => s"tok$i").mkString(" ")
    val wordsB = (1 to 50).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, wordsA), (2L, wordsB)).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardJoin(df, "doc_id", "text", shingleN = 1,
      threshold = 0.8, wordGrams = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
    // and a pair just BELOW the threshold stays excluded (39/50 = 0.78)
    val wordsC = ((1 to 39).map(i => s"tok$i") ++ Seq("zzz")).mkString(" ")
    val df2 = Seq((1L, wordsC), (2L, wordsB)).toDF("doc_id", "text")
    val got2 = Dedup.ngramJaccardJoin(df2, "doc_id", "text", shingleN = 1,
      threshold = 0.8, wordGrams = true).count()
    assert(got2 == 0L)
  }

  test("exactNormalized: reformatted copies group; distinct CJK docs do NOT (review r3)") {
    val df = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),          // same after normalization
      (3L, "你好世界"),              // distinct CJK documents must keep
      (4L, "完全不同的文字"),        // their letters — not collapse to ""
      (5L, "ab")              // vertical tab = punctuation, both engines
    ).toDF("doc_id", "text")
    val groups = Dedup.exactNormalized(df, "doc_id", "text")
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(groups == Set((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
    // the explicit whitespace class strips  as punctuation: "ab"
    val norm = df.where($"doc_id" === 5L)
      .select(Dedup.normalizedText($"text")).as[String].head()
    assert(norm == "ab")
  }

  test("embeddingExactPairs: matches manual cosine on all pairs") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingExactPairs(vecs, "vec_id", "embedding", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L))) // cos(0,1)=0.994; all others ≤ 0.11
  }

  test("simhash banding is complete: equals brute-force hamming pairs") {
    import graft.functions.GraftExpressions._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fp = real.select($"doc_id",
      graft.functions.TextAnalysis.simhash($"text").as("fp"))
    val brute = fp.alias("a").join(fp.alias("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        hamming64($"a.fp", $"b.fp").as("h"))
    // pigeonhole guarantee holds only for maxHamming ≤ chunks-1 = 3
    val got = Dedup.simhashNearDups(real, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = brute.where($"h" <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("ngramJaccardJoin plan: no cartesian/SMJ — candidates come from buckets") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.ngramJaccardJoin(real, "doc_id", "text", 3, 0.8,
      wordGrams = true).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan) // verify joins broadcast
  }

  test("ngramJaccardJoin non-broadcast verify path matches broadcast path") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val b = Dedup.ngramJaccardJoin(real, "doc_id", "text", 3, 0.8,
      wordGrams = true).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val nb = Dedup.ngramJaccardJoin(real, "doc_id", "text", 3, 0.8,
      wordGrams = true, broadcastSketches = false)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(b == nb)
  }

  test("near-dup scan over real documents table runs and is plausible") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.minhashNearDups(real, "doc_id", "text", threshold = 0.8)
    val n = pairs.count()
    assert(n >= 0 && n < 500) // sanity: not everything is a near-dup
  }

  test("dropFrequentLines cuts corpus-frequent lines, keeps order, keeps empty docs") {
    val docs = Seq(
      (1L, "keep me\nCOOKIE BANNER\nalso keep\nCOOKIE BANNER"),
      (2L, "COOKIE BANNER\nunique line two"),
      (3L, "NAV\nNAV middle\nNAV"), // NAV repeats WITHIN one doc only
      (4L, "COOKIE BANNER")         // all boilerplate -> empties
    ).toDF("doc_id", "text")
    val got = Dedup.dropFrequentLines(docs, "doc_id", "text", minCount = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    // COOKIE BANNER occurs 4x (>=3, dropped); NAV occurs 2x in one doc
    // (<3, kept — but counted globally, so a 3rd occurrence elsewhere
    // would drop it)
    assert(got(0) == ((1L, "keep me\nalso keep", 2L, 2L)))
    assert(got(1) == ((2L, "unique line two", 1L, 1L)))
    assert(got(2) == ((3L, "NAV\nNAV middle\nNAV", 3L, 0L)))
    assert(got(3) == ((4L, "", 0L, 1L)))
  }

  test("property: dropFrequentLines is reconstruction-exact and count-consistent") {
    val rng = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "gamma", "", "x y", "tab\there")
    for (_ <- 1 to 4) {
      val docs = Seq.tabulate(30) { i =>
        val n = 1 + rng.nextInt(6)
        (i.toLong, Seq.fill(n)(words(rng.nextInt(words.size))).mkString("\n"))
      }
      val df = docs.toDF("doc_id", "text")
      // minCount above any possible frequency → identity reconstruction,
      // proving split/sort/rejoin loses nothing (incl. empty lines and
      // lines containing spaces/tabs)
      val id = Dedup.dropFrequentLines(df, "doc_id", "text", minCount = 10000)
        .as[(Long, String, Long, Long)].collect()
      val orig = docs.toMap
      id.foreach { case (k, txt, kept, dropped) =>
        assert(txt == orig(k), s"doc $k reconstruction changed")
        assert(dropped == 0 && kept == orig(k).split("\n", -1).length)
      }
      // at a real threshold the per-doc ledger stays consistent:
      // kept + dropped == total segments
      val real = Dedup.dropFrequentLines(df, "doc_id", "text", minCount = 3)
        .as[(Long, String, Long, Long)].collect()
      real.foreach { case (k, _, kept, dropped) =>
        assert(kept + dropped == orig(k).split("\n", -1).length, s"doc $k ledger")
      }
    }
  }

  test("dropFrequentLines non-broadcast path matches broadcast path") {
    val docs = Seq(
      (1L, "a\nb\nc"), (2L, "b\nc\nd"), (3L, "c\nd\ne")
    ).toDF("doc_id", "text")
    def run(bc: Boolean) =
      Dedup.dropFrequentLines(docs, "doc_id", "text", 2, broadcastCommon = bc)
        .as[(Long, String, Long, Long)].collect().toSet
    assert(run(true) == run(false))
    assert(run(true) == Set((1L, "a", 1L, 2L), (2L, "", 0L, 3L), (3L, "e", 1L, 2L)))
  }
}
