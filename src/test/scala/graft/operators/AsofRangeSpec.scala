package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

/** Round-3 operators: as-of join, binned range join, decontamination,
  * PII scrubbing.
  */
class AsofRangeSpec extends SparkSpec {
  import spark.implicits._

  // ── AsofJoin ───────────────────────────────────────────────────────────

  private def quotes =
    Seq((1L, 10L, "q10"), (1L, 20L, "q20"), (2L, 15L, "q15"))
      .toDF("k", "ts", "quote")

  test("asof backward: latest at-or-before per key; null when none precedes") {
    val trades = Seq((1L, 5L), (1L, 10L), (1L, 25L), (2L, 14L), (3L, 99L))
      .toDF("k", "ts")
    val got = AsofJoin.backward(trades, quotes, Seq("k"), "ts", "ts",
        payload = Seq("quote"))
      .select($"k", $"ts", $"asof_quote").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 5L, None),          // nothing at-or-before 5
      (1L, 10L, Some("q10")),  // equal ts matches (>= semantics)
      (1L, 25L, Some("q20")),  // latest of the two
      (2L, 14L, None),         // q15 is after
      (3L, 99L, None)))        // key absent on the right
  }

  test("asof: null right timestamp never matches (code-review r3)") {
    val trades = Seq((1L, 5L)).toDF("k", "ts")
    val nullQuotes = Seq((1L, Option.empty[Long], "qNull"), (1L, Some(3L), "q3"))
      .toDF("k", "ts", "quote")
    val got = AsofJoin.backward(trades, nullQuotes, Seq("k"), "ts", "ts",
        payload = Seq("quote"))
      .select($"asof_quote").as[Option[String]].collect().toSet
    // l.ts >= null is never true: the null-ts quote must not win over q3
    assert(got == Set(Some("q3")))
  }

  test("asof strict: equal-ts right row is excluded") {
    val trades = Seq((1L, 10L)).toDF("k", "ts")
    val got = AsofJoin.backward(trades, quotes, Seq("k"), "ts", "ts",
        payload = Seq("quote"), strict = true)
      .select($"asof_quote").as[Option[String]].collect().toSet
    assert(got == Set(None))
  }

  test("asof plan: exactly one exchange — no range join, no cartesian") {
    val trades = Seq((1L, 5L)).toDF("k", "ts")
    val plan = AsofJoin.backward(trades, quotes, Seq("k"), "ts", "ts",
      payload = Seq("quote")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
    // the union-window form shuffles ONCE on the key
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("asof matches the window-free definition on real events (sf0.001)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts_us", unix_micros($"ts".cast("timestamp")))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts_us".as("p_ts"), $"event_id".as("p_id"))
    val got = AsofJoin.backward(
      ev.select($"event_id", $"user_id", $"ts_us"), purchases,
      Seq("user_id"), "ts_us", "p_ts", payload = Seq("p_id"), outPrefix = "")
    // oracle: max_by over the qualifying right rows, per left row
    val want = ev.select($"event_id", $"user_id", $"ts_us").as("l")
      .join(purchases.as("r"),
        $"l.user_id" === $"r.user_id" && $"l.ts_us" >= $"r.p_ts", "left")
      .groupBy($"l.event_id".as("event_id"))
      .agg(max($"r.p_ts").as("_"), max_by($"r.p_id", $"r.p_ts").as("p_id"))
    val mismatches = got.select($"event_id", $"p_id")
      .except(want.select($"event_id", $"p_id")).count()
    assert(mismatches == 0)
  }

  test("asof property: equals the declarative definition on random data") {
    // randomized cross-check (fixed seeds): duplicate keys, clustered ts,
    // ties between left and right, keys on one side only
    for (seed <- Seq(1, 42, 7)) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.tabulate(60)(i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
        .toDF("lid", "k", "ts")
      val right = Seq.tabulate(30)(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, i.toLong))
        .toDF("k", "ts", "payload")
        // one right row per (k, ts): duplicate right timestamps make the
        // as-of winner ill-defined in ANY engine — exclude, like real feeds
        .groupBy("k", "ts").agg(max("payload").as("payload"))
      for (strict <- Seq(false, true)) {
        val got = AsofJoin.backward(left, right, Seq("k"), "ts", "ts",
          payload = Seq("payload"), strict = strict)
          .select($"lid", $"asof_payload")
          .as[(Long, Option[Long])].collect().toMap
        val cond = if (strict) $"l.ts" > $"r.ts" else $"l.ts" >= $"r.ts"
        val want = left.as("l")
          .join(right.as("r"), $"l.k" === $"r.k" && cond, "left")
          .groupBy($"l.lid")
          .agg(max_by($"r.payload", $"r.ts").as("p"))
          .as[(Long, Option[Long])].collect().toMap
        assert(got == want, s"seed=$seed strict=$strict")
      }
    }
  }

  // ── RangeJoin ──────────────────────────────────────────────────────────

  private def ranges =
    Seq((10L, 0.0, 10.0), (11L, 5.0, 7.0), (12L, 50.0, 51.0), (13L, -3.0, 1.0))
      .toDF("range_id", "lo", "hi")

  test("binned range join equals the naive BETWEEN join, no duplicates") {
    val points = Seq((1L, 5.0), (2L, 6.5), (3L, 10.0), (4L, 49.99),
      (5L, -1.0), (6L, 100.0)).toDF("point_id", "v")
    for (w <- Seq(0.5, 3.0, 100.0)) {
      val got = RangeJoin.binned(points, "v", ranges, "lo", "hi", binWidth = w)
        .select($"point_id", $"range_id").as[(Long, Long)].collect().toList
      val want = points.join(ranges, $"v" >= $"lo" && $"v" <= $"hi")
        .select($"point_id", $"range_id").as[(Long, Long)].collect().toList
      // list (not set) compare: binning must not double-emit a match
      assert(got.sorted == want.sorted, s"binWidth=$w")
    }
  }

  test("binned range join: empty/inverted ranges drop out; plan is equi-join") {
    val points = Seq((1L, 5.0)).toDF("point_id", "v")
    val bad = Seq((1L, 9.0, 2.0)).toDF("range_id", "lo", "hi") // lo > hi
    assert(RangeJoin.binned(points, "v", bad, "lo", "hi", 1.0).count() == 0)
    val plan = RangeJoin.binned(points, "v", ranges, "lo", "hi", 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  // ── Decontaminate ──────────────────────────────────────────────────────

  test("decontaminate: shared-gram counts, bench-only grams don't flag") {
    val corpus = Seq(
      (1L, "a b c d e"),   // shares trigrams "a b c","b c d","c d e" with bench
      (2L, "x y z w q"),   // clean
      (3L, "c d e f g")    // shares "c d e"
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val got = Decontaminate.overlap(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 3L -> 2L)) // doc 3: "c d e","d e f"
    // minShared raises the bar
    val strict = Decontaminate.overlap(corpus, bench, "doc_id", "text", n = 3,
      minShared = 3).as[(Long, Long)].collect().toMap
    assert(strict == Map(1L -> 3L))
  }

  test("decontaminate bloom path ≡ exact path (output identical, map-side prefilter)") {
    // the bloom changes where bytes move, never the answer: identical
    // output on real text, including bloom false positives (survivors are
    // re-verified by the exact join)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.where($"doc_id" % 10 =!= 0)
    val bench = docs.where($"doc_id" % 10 === 0)
    val exact = Decontaminate.overlap(corpus, bench, "doc_id", "text", n = 13)
      .as[(Long, Long)].collect().toSet
    // tiny bitsPerGram forces a HIGH false-positive rate — the exact
    // verify join must still strip every FP
    for (bits <- Seq(2, 16)) {
      val bloom = Decontaminate.overlapBloom(corpus, bench, "doc_id", "text",
        n = 13, bitsPerGram = bits).as[(Long, Long)].collect().toSet
      assert(bloom == exact, s"bitsPerGram=$bits diverged")
    }
    assert(exact.nonEmpty) // the sf0.001 slice genuinely overlaps
    // empty benchmark side: nothing flags, nothing crashes
    assert(Decontaminate.overlapBloom(corpus, bench.where(lit(false)),
      "doc_id", "text", n = 13).count() == 0)
  }

  test("dedup keepBest keeps the highest-scoring copy, ties resolve by id") {
    val df = Seq(
      (1L, "same text", 0.3), (2L, "same text", 0.9), (3L, "same text", 0.9),
      (4L, "other", 0.5)
    ).toDF("doc_id", "text", "q")
    val got = Dedup.keepBest(df, "doc_id", "text", $"q")
      .select($"keep_id", $"best_score", $"n_copies")
      .as[(Long, Double, Long)].collect().toSet
    // score tie at 0.9 → larger id wins (lexicographic (score, id) max)
    assert(got == Set((3L, 0.9, 3L), (4L, 0.5, 1L)))
    // partition-invariant
    val re = Dedup.keepBest(df.repartition(5), "doc_id", "text", $"q")
      .select($"keep_id").as[Long].collect().toSet
    assert(re == Set(3L, 4L))
  }

  test("maintainDistinct: maintained HLL ≡ from-scratch, replay-free, near-exact") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type", $"user_id", $"event_id")
    val old = ev.where($"event_id" % 3 =!= 0)
    val batch = ev.where($"event_id" % 3 === 0)
    val stored = IncrementalAgg.distinctSketch(old, "event_type", "user_id")
    val maintained = IncrementalAgg.maintainDistinct(
      stored.select($"event_type", $"sketch"), batch, "event_type", "user_id")
    val scratch = IncrementalAgg.distinctSketch(ev, "event_type", "user_id")
    // BIT-IDENTICAL registers: maintenance is exact at the sketch level
    val m = maintained.select($"event_type", $"sketch")
      .as[(String, Array[Byte])].collect()
      .map { case (g, s) => g -> s.toSeq }.toMap
    val s = scratch.select($"event_type", $"sketch")
      .as[(String, Array[Byte])].collect()
      .map { case (g, s0) => g -> s0.toSeq }.toMap
    assert(m == s)
    // replaying the same batch changes nothing (register max is idempotent)
    val replayed = IncrementalAgg.maintainDistinct(
      maintained.select($"event_type", $"sketch"), batch,
      "event_type", "user_id")
    assert(replayed.select($"event_type", $"sketch")
      .as[(String, Array[Byte])].collect()
      .map { case (g, s0) => g -> s0.toSeq }.toMap == s)
    // estimates land within HLL's p=12 error envelope of the exact counts
    val exact = ev.groupBy("event_type")
      .agg(countDistinct($"user_id").as("d"))
      .as[(String, Long)].collect().toMap
    maintained.select($"event_type", $"n_distinct_est")
      .as[(String, Double)].collect().foreach { case (g, est) =>
        val e = exact(g).toDouble
        assert(math.abs(est - e) / e < 0.05, s"$g: est=$est exact=$e")
      }
    // partition-invariant (register math is order-free)
    val re = IncrementalAgg.distinctSketch(ev.repartition(13),
      "event_type", "user_id")
      .select($"event_type", $"sketch").as[(String, Array[Byte])].collect()
      .map { case (g, s0) => g -> s0.toSeq }.toMap
    assert(re == s)
  }

  test("distinctSketch: null keys count as one value; version fence refuses foreign sketches") {
    // a null key must not crash the job (fnv64 is null-intolerant; the
    // sentinel hash stands in — review r10) and counts as ONE distinct
    val df = Seq((Some(1L), "g"), (Some(2L), "g"), (None, "g"), (None, "g"))
      .toDF("k", "grp")
    val est = IncrementalAgg.distinctSketch(df, "grp", "k")
      .select($"n_distinct_est").head().getDouble(0)
    assert(math.abs(est - 3.0) < 0.5, s"est=$est for 3 distinct (incl null)")
    // sketches carry a format-version byte: merging a pre-upgrade sketch
    // (different register hash space) must refuse LOUDLY, not silently
    // double-count (review r10)
    val legacy = new Array[Byte](4096) // headerless xxhash64-era format
    intercept[IllegalArgumentException] {
      graft.functions.SketchOps.hllMerge(
        graft.functions.SketchOps.hllZero(), legacy)
    }
  }

  test("decontaminate plan: benchmark side broadcasts") {
    val corpus = Seq((1L, "a b c")).toDF("doc_id", "text")
    val bench = Seq((2L, "a b c")).toDF("doc_id", "text")
    val plan = Decontaminate.overlap(corpus, bench, "doc_id", "text", n = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ── IncrementalAgg ─────────────────────────────────────────────────────

  test("maintainCountSum ≡ full recompute, including group birth and death") {
    val dec = (c: org.apache.spark.sql.Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val old = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
      .toDF("k", "g", "v").select($"k", $"g", dec($"v").as("v"))
    // changes: k=2 moves a→c (group birth), k=3 deleted (b dies),
    // k=1 value update in place
    val oldRows = old.where($"k".isin(1L, 2L, 3L))
    val newRows = Seq((1L, "a", 11.0), (2L, "c", 20.0))
      .toDF("k", "g", "v").select($"g", dec($"v").as("v"))
    val oldAgg = old.groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val got = IncrementalAgg.maintainCountSum(oldAgg, oldRows, newRows, "g", "v")
      .select($"g", $"n", $"s".cast("double")).as[(String, Long, Double)]
      .collect().toSet
    assert(got == Set(("a", 1L, 11.0), ("c", 1L, 20.0))) // b removed at n=0
  }

  test("maintainDistinctSupport ≡ full recompute: deletes, last-copy, births") {
    val old = Seq((1L, "a", 10), (2L, "a", 10), (3L, "a", 20), (4L, "b", 5))
      .toDF("k", "g", "v")
    val support = IncrementalAgg.buildDistinctSupport(old, "g", "v")
    // k=1 deleted (v=10 survives via k=2), k=3 deleted (LAST copy of 20 —
    // the case HLL cannot answer), k=4 moves b→c with a new value (b dies,
    // c born), k=5 inserts a fresh value into a
    val oldRows = old.where($"k".isin(1L, 3L, 4L))
    val newRows = Seq((4L, "c", 7), (5L, "a", 30)).toDF("k", "g", "v")
    val got = IncrementalAgg.distinctFromSupport(
        IncrementalAgg.maintainDistinctSupport(support, oldRows, newRows, "g", "v"),
        "g").as[(String, Long)].collect().toSet
    // final rows: (2,a,10), (5,a,30), (4,c,7)
    assert(got == Set(("a", 2L), ("c", 1L)))
    // and the maintained support equals a from-scratch build on final rows
    val finalRows = Seq((2L, "a", 10), (5L, "a", 30), (4L, "c", 7)).toDF("k", "g", "v")
    val fromScratch = IncrementalAgg.buildDistinctSupport(finalRows, "g", "v")
      .as[(String, Int, Long)].collect().toSet
    val maintained = IncrementalAgg.maintainDistinctSupport(
        support, oldRows, newRows, "g", "v")
      .as[(String, Int, Long)].collect().toSet
    assert(maintained == fromScratch)
  }

  // ── Chunking + shard packing ───────────────────────────────────────────

  test("chunkByTokens: coverage, overlap, and short-doc edge cases") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks → 3 chunks
      (2L, "a b c"),                                  // under max → 1 chunk
      (3L, (1 to 4).map(i => s"x$i").mkString(" "))   // exactly max → 1 chunk
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        explode(TextAnalysis.chunkByTokens($"text", 4, 1)).as("c"))
      .select($"doc_id", $"c.start_tok", $"c.chunk", $"c.n_tok")
      .as[(Long, Int, String, Int)].collect().toSet
    assert(got == Set(
      (1L, 0, "w1 w2 w3 w4", 4), (1L, 3, "w4 w5 w6 w7", 4),
      (1L, 6, "w7 w8 w9 w10", 4),
      (2L, 0, "a b c", 3),
      (3L, 0, "x1 x2 x3 x4", 4)))
    // every token is covered; consecutive chunks overlap by exactly 1
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens($"text", 4, 4)
    }
  }

  test("shard assignment is exact and invariant to parallelism") {
    val docs = Seq.tabulate(100)(i => (i.toLong, (i % 7 + 1) * 10L))
      .toDF("doc_id", "n_tok")
    val want = docs.orderBy($"doc_id").as[(Long, Long)].collect()
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n, cum + n) }
      .tail.map { case (id, n, cumAfter) =>
        (id, n, cumAfter - n, (cumAfter - n) / 100) }.toSet
    // exchange reuse OFF: code-review r3 found the original implementation
    // was only correct because Spark happened to reuse the (sampled, hence
    // nondeterministic) range exchange between its two subtrees — the
    // rewrite must not depend on that optimization
    val prev = spark.conf.get("spark.sql.exchange.reuse")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      for (parts <- Seq(1, 3, 8)) {
        val got = Shards.assignByTokenBudget(
            docs.repartition(parts), "doc_id", "n_tok", budget = 100L)
          .select($"doc_id", $"n_tok", $"cum_before", $"shard")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(got == want, s"parts=$parts")
      }
    } finally spark.conf.set("spark.sql.exchange.reuse", prev)
    // bucket ids come from literal cut points — the plan must contain no
    // sampled range exchange (whose boundaries could differ between
    // subtrees) and no global single-partition sort of the corpus
    val plan = Shards.assignByTokenBudget(docs, "doc_id", "n_tok", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("packText concatenates each shard in id order, bounded groups") {
    val docs = Seq((3L, "ccc", 3L), (1L, "aaaa", 4L), (2L, "bb", 2L),
      (4L, "dd", 2L)).toDF("doc_id", "text", "n_tok")
    // budget 6: doc1(4)+doc2(2) fill shard 0; doc3 starts at cum 6 → shard
    // 1 with doc4 (cum 9 < 12)
    val got = Shards.packText(docs, "doc_id", "text", "n_tok", budget = 6L,
        eos = "|")
      .orderBy($"shard")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq((0L, 2L, 6L, "aaaa|bb"), (1L, 2L, 5L, "ccc|dd")))
    // partition-invariance carries through the concat
    val re = Shards.packText(docs.repartition(5), "doc_id", "text", "n_tok",
        budget = 6L, eos = "|")
      .orderBy($"shard").as[(Long, Long, Long, String)].collect().toSeq
    assert(re === got)
  }

  test("packSpans: exact-length sequences reassemble; spans partition each doc") {
    val docs = Seq((1L, 4L), (2L, 7L), (3L, 2L), (4L, 0L), (5L, 13L))
      .toDF("doc_id", "n_tok")
    // budget 5 over cum [0,4,11,13,13]: doc1→seq0[0,4); doc2 straddles
    // seq0 (1 tok) + seq1 (5) + seq2 (1); doc3 in seq2; doc4 empty → gone;
    // doc5 spans seq2(2)+seq3(5)+seq4(5)+seq5(1)
    val got = Shards.packSpans(docs, "doc_id", "n_tok", budget = 5L)
      .select($"doc_id", $"seq", $"tok_start", $"tok_end", $"seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (1L, 0L, 0L, 4L, 0L),
      (2L, 0L, 0L, 1L, 4L), (2L, 1L, 1L, 6L, 0L), (2L, 2L, 6L, 7L, 0L),
      (3L, 2L, 0L, 2L, 1L),
      (5L, 2L, 0L, 2L, 3L), (5L, 3L, 2L, 7L, 0L), (5L, 4L, 7L, 12L, 0L),
      (5L, 5L, 12L, 13L, 0L))
    assert(got === want)
    // invariants at property scale: spans tile each doc exactly, every
    // sequence but the last holds exactly `budget` tokens, and offsets
    // within a sequence are contiguous
    val big = Seq.tabulate(200)(i => (i.toLong, (i % 11 + 1).toLong))
      .toDF("doc_id", "n_tok")
    val spans = Shards.packSpans(big, "doc_id", "n_tok", budget = 7L)
      .select($"doc_id", $"seq", $"tok_start", $"tok_end", $"seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    val perDoc = spans.groupBy(_._1)
    assert(perDoc.forall { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.head._3 == 0 &&
        sorted.sliding(2).forall {
          case Array(a, b) => a._4 == b._3 && a._2 + 1 == b._2
          case _ => true
        }
    })
    val perSeq = spans.groupBy(_._2).map { case (s, ss) =>
      s -> ss.map(x => x._4 - x._3).sum }
    val lastSeq = perSeq.keys.max
    assert(perSeq.filter(_._1 != lastSeq).values.forall(_ == 7L))
    // partition-invariance
    val re = Shards.packSpans(big.repartition(7), "doc_id", "n_tok", 7L)
      .select($"doc_id", $"seq", $"tok_start", $"tok_end", $"seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(re === spans.toSet)
  }

  // ── Split assignment ───────────────────────────────────────────────────

  test("splits: deterministic, partition-invariant, exhaustive, near-weights") {
    val ids = spark.range(20000).toDF("id")
    val w = Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0)
    val a = Splits.assign(ids, "id", w).groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    // exhaustive + proportions within 2% absolute
    assert(a.values.sum == 20000 && a.keySet == Set("train", "val", "test"))
    assert(math.abs(a("train") / 20000.0 - 0.8) < 0.02, a)
    assert(math.abs(a("val") / 20000.0 - 0.1) < 0.02, a)
    // identical assignment regardless of partitioning (unlike randomSplit)
    val flat = Splits.assign(ids, "id", w).select($"id", $"split")
      .as[(Long, String)].collect().toSet
    val reparted = Splits.assign(ids.repartition(7), "id", w)
      .select($"id", $"split").as[(Long, String)].collect().toSet
    assert(flat == reparted)
    // a different seed is a genuinely different deal
    val reseeded = Splits.assign(ids, "id", w, seed = 7L)
      .select($"id", $"split").as[(Long, String)].collect().toSet
    assert(flat != reseeded)
  }

  test("group-aware splits: zero near-dup leakage; the id-based deal does leak") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select($"id_a", $"id_b").localCheckpoint(true)
    assert(pairs.count() > 0) // corpus must exercise the property
    val groups = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
    val assigned = docs.select($"doc_id")
      .join(broadcast(groups), Seq("doc_id"), "left")
      .select($"doc_id", Splits.assignExpr(
        coalesce($"component", $"doc_id"), w).alias("split"))
    val leaks = pairs
      .join(assigned.toDF("id_a", "split_a"), "id_a")
      .join(assigned.toDF("id_b", "split_b"), "id_b")
      .where($"split_a" =!= $"split_b").count()
    assert(leaks === 0L)
    // baseline: dealing from the raw id DOES split some duplicate family
    // on this corpus — the reason the audit and the group deal exist
    val idLeaks = pairs.where(
      Splits.assignExpr($"id_a", w) =!= Splits.assignExpr($"id_b", w)).count()
    assert(idLeaks > 0L)
  }

  // ── Approximate sketches ───────────────────────────────────────────────

  test("approx_count_distinct (HLL++) lands within its error bound on real data") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val row = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey", 0.05).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    // rsd 0.05 → generous 3x tolerance; the point is sketch-vs-exact wiring
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"exact=$exact approx=$approx")
    // percentile_approx stays within 2% of the exact interpolated quantile
    val r2 = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx_p50"))
      .head()
    assert(math.abs(r2.getDouble(0) - r2.getDouble(1)) / r2.getDouble(0) < 0.02)
  }

  // ── PII scrub ──────────────────────────────────────────────────────────

  test("redactPii: email, phone, id-run — order prevents double redaction") {
    val df = Seq(
      ("reach me at jane.doe+x@corp.example.org or 25-989-741-2988"),
      ("order 123456789 shipped"),
      ("no pii here"),
      ("short 12345 stays")).toDF("text")
      .select(TextAnalysis.redactPii($"text").as("red"),
        TextAnalysis.piiCount($"text").as("n"))
    val got = df.as[(String, Int)].collect().toList
    assert(got == List(
      ("reach me at <EMAIL> or <PHONE>", 2),
      ("order <ID> shipped", 1),
      ("no pii here", 0),
      ("short 12345 stays", 0)))
  }
}
