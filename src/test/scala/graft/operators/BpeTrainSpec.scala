package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE worked example (low/lower/newest/widest), hand-traced:
  //   merge 1: (e,s) c=9 — ties (s,t) at 9, pair-lexicographic break
  //   merge 2: (es,t) c=9
  //   merge 3: (l,o) c=7 — ties (o,w) at 7
  private lazy val corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest"
  ).toDF("text")

  test("train learns the hand-traced merges with deterministic tie-breaks") {
    val got = BpeTrain.train(corpus, "text", numMerges = 3)
      .orderBy("rank")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L)))
  }

  test("fuse is greedy left-to-right non-overlapping") {
    val got = Seq("aaaa", "aaa", "baab").toDF("w")
      .select(BpeTrain.fuse(BpeTrain.charSyms(col("w")), "a", "a").alias("s"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aa", "aa"), Seq("aa", "a"), Seq("b", "aa", "b")))
  }

  test("fuse properties on random words: lossless, greedy-complete, idempotent") {
    val rnd = new scala.util.Random(42)
    val words = (1 to 300).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    for ((l, r) <- Seq(("a", "b"), ("a", "a"), ("c", "a"))) {
      val fused = words.toDF("w")
        .select(BpeTrain.fuse(BpeTrain.charSyms(col("w")), l, r).alias("s"))
      val got = fused.as[Seq[String]].collect().toSeq
      words.zip(got).foreach { case (w, syms) =>
        assert(syms.mkString == w, s"lossy fuse of '$w' under ($l,$r): $syms")
        assert(!syms.sliding(2).exists(p =>
          p.length == 2 && p(0) == l && p(1) == r),
          s"unfused ($l,$r) adjacency left in '$w': $syms")
      }
      val twice = fused.select(BpeTrain.fuse(col("s"), l, r).alias("s"))
        .as[Seq[String]].collect().toSeq
      assert(got == twice, s"fuse under ($l,$r) is not idempotent")
    }
  }

  test("train ≡ an independent in-Scala BPE reference on random corpora") {
    val rnd = new scala.util.Random(5)
    def fuseRef(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r =>
          (l + r) :: fuseRef(rest, l, r)
        case a :: rest => a :: fuseRef(rest, l, r)
        case Nil => Nil
      }
    def trainRef(texts: Seq[String], k: Int): Seq[(Long, String, String, Long)] = {
      var vocab = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) =>
          (w.map(_.toString).toList, ws.size.toLong) }.toSeq
      val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
      var rank = 1L
      var done = false
      while (rank <= k && !done) {
        val pairs = vocab.flatMap { case (syms, cnt) =>
          syms.sliding(2).collect { case List(a, b) => ((a, b), cnt) }
        }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
        if (pairs.isEmpty) done = true
        else {
          val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((rank, l, r, c))
          vocab = vocab.map { case (syms, cnt) => (fuseRef(syms, l, r), cnt) }
          rank += 1
        }
      }
      out.toSeq
    }
    (1 to 8).foreach { trial =>
      // small alphabet forces heavy pair collisions and ties
      val texts = (1 to 10).map(_ => (1 to (2 + rnd.nextInt(6))).map(_ =>
        (1 to (1 + rnd.nextInt(6))).map(_ =>
          ('a' + rnd.nextInt(3)).toChar).mkString).mkString(" "))
      val got = BpeTrain.train(texts.toDF("text"), "text", numMerges = 5)
        .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
      assert(got == trainRef(texts, 5), s"trial $trial on corpus $texts")
    }
  }

  test("train is partitioning-invariant (corpus row order immaterial)") {
    val a = BpeTrain.train(corpus, "text", 3)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    val b = BpeTrain.train(corpus.repartition(7), "text", 3)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    assert(a == b)
  }

  test("train stops early when no adjacent pair remains") {
    val got = BpeTrain.train(Seq("a b c a").toDF("text"), "text", numMerges = 5)
    assert(got.count() == 0)
  }

  test("tokens/tokenCount apply the learned table in rank order") {
    val merges = BpeTrain.train(corpus, "text", numMerges = 3)
      .orderBy("rank").as[(Long, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val doc = Seq("low lower newest").toDF("text")
    // low -> [lo, w]; lower -> [lo, w, e, r]; newest -> [n, e, w, est]
    val toks = doc.select(BpeTrain.tokens(col("text"), merges).alias("t"))
      .as[Seq[Seq[String]]].head()
    assert(toks == Seq(Seq("lo", "w"), Seq("lo", "w", "e", "r"),
      Seq("n", "e", "w", "est")))
    val n = doc.select(BpeTrain.tokenCount(col("text"), merges).alias("n"))
      .as[Long].head()
    assert(n == 10L)
  }

  test("tokenCounts (fold per distinct word + broadcast join) ≡ per-row tokenCount") {
    val docs = corpus.withColumn("id", monotonically_increasing_id())
    val merges = BpeTrain.train(corpus, "text", numMerges = 3)
      .orderBy("rank").as[(Long, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val scaled = BpeTrain.tokenCounts(docs, "id", "text", merges)
      .as[(Long, Long)].collect().toMap
    val perRow = docs.select(col("id"),
        BpeTrain.tokenCount(col("text"), merges).alias("n"))
      .as[(Long, Long)].collect().toMap
    assert(scaled == perRow)
  }

  test("tokenizing the training words with the learned table reproduces the trainer's folded vocab") {
    val merges = BpeTrain.train(corpus, "text", numMerges = 3)
      .orderBy("rank").as[(Long, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    // apply-in-rank-order over initial chars must equal iterative training
    // state: fold all three merges over 'newest'
    val got = Seq("newest").toDF("w")
      .select(merges.foldLeft(BpeTrain.charSyms(col("w"))) {
        case (s, (l, r)) => BpeTrain.fuse(s, l, r)
      }.alias("s")).as[Seq[String]].head()
    assert(got == Seq("n", "e", "w", "est"))
  }
}
