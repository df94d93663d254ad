package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins [[Retrieval]] BM25 semantics on a corpus small enough to compute
  * by hand, and search/index consistency on a larger one.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // N = 3 docs; dl = 4, 2, 2; avgdl = 8/3
  private lazy val corpus = Seq(
    (1L, "cat dog cat fish"),
    (2L, "dog bird"),
    (3L, "fish fish")
  ).toDF("doc_id", "text")

  private def bm25(tf: Long, df: Long, dl: Long, n: Long = 3,
      avgdl: Double = 8.0 / 3.0, k1: Double = 1.2, b: Double = 0.75) = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))
  }

  test("bm25Index matches the hand-computed weights") {
    val rows = Retrieval.bm25Index(corpus, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) -> r)
      .toMap
    assert(rows.size === 6) // (1,cat)(1,dog)(1,fish)(2,dog)(2,bird)(3,fish)
    val catD1 = rows((1L, "cat"))
    assert(catD1.getAs[Long]("tf") === 2L)
    assert(catD1.getAs[Long]("df") === 1L)
    assert(catD1.getAs[Long]("dl") === 4L)
    assert(math.abs(catD1.getAs[Double]("bm25") - bm25(2, 1, 4)) < 1e-12)
    assert(math.abs(rows((3L, "fish")).getAs[Double]("bm25") -
      bm25(2, 2, 2)) < 1e-12)
    // a term in every doc still scores positive (Lucene idf variant)
    assert(rows((2L, "dog")).getAs[Double]("bm25") > 0.0)
  }

  test("bm25Search ranks, sums per-term weights, and breaks ties by id") {
    val top = Retrieval.bm25Search(corpus, "doc_id", "text",
      Seq("cat", "fish"), k = 3).collect()
    assert(top.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L))
    val d1 = top.head
    assert(d1.getAs[Long]("n_terms") === 2L)
    assert(math.abs(d1.getAs[Double]("score") -
      (bm25(2, 1, 4) + bm25(1, 2, 4))) < 1e-12)
    assert(math.abs(top(1).getAs[Double]("score") - bm25(2, 2, 2)) < 1e-12)
  }

  test("search equals the index summed over query terms (consistency)") {
    val docs = (0L until 40L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 7} filler$i"))
      .toDF("doc_id", "text")
    val q = Seq("w1", "w3")
    val viaIndex = Retrieval.bm25Index(docs, "doc_id", "text")
      .where(col("term").isin(q: _*))
      .groupBy(col("doc_id")).agg(sum(col("bm25")).alias("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaSearch = Retrieval.bm25Search(docs, "doc_id", "text", q, k = 100)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(viaSearch.keySet === viaIndex.keySet)
    viaSearch.foreach { case (id, s) =>
      assert(math.abs(s - viaIndex(id)) < 1e-9, s"doc $id")
    }
  }

  test("duplicate query terms count once; k caps the result") {
    val top = Retrieval.bm25Search(corpus, "doc_id", "text",
      Seq("fish", "fish", "cat"), k = 1).collect()
    assert(top.length === 1)
    assert(top.head.getAs[Long]("doc_id") === 1L)
  }

  test("rrfFuse: contribution sums, single-list docs, tie-break, list order") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "id", "rank", topK = 10,
      kConst = 60).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap
    // both-lists docs: 1/(60+r_a) + 1/(60+r_b); 10 and 20 tie EXACTLY
    // (1/61 + 1/62 either way) → id breaks the tie
    assert(fused(10L)._1 === 2L && fused(20L)._1 === 2L)
    assert(fused(10L)._2 === 1.0 / 61 + 1.0 / 62)
    assert(fused(10L)._3 === 1 && fused(20L)._3 === 2)
    // single-list docs contribute one term and rank behind
    assert(fused(30L) === ((1L, 1.0 / 63, 3)))
    assert(fused(40L) === ((1L, 1.0 / 63, 4))) // equal score → id order
    // fusion is invariant to the ORDER the lists are passed in (the fold
    // runs in fixed source order per id, but RRF itself is symmetric for
    // two addends) and topK caps
    val swapped = Retrieval.rrfFuse(Seq(b, a), "id", "rank", topK = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(swapped === Seq((10L, 1.0 / 61 + 1.0 / 62), (20L, 1.0 / 61 + 1.0 / 62)))
  }

  test("mmrRerank: diversity outranks raw relevance; short queries stop early (r12)") {
    import spark.implicits._
    // query 1: a (rel .99) and b (rel .98) nearly identical vectors,
    // c (rel .5) orthogonal — pure relevance would pick a, b; MMR must
    // pick a, then c (b's redundancy penalty sinks it), then b
    val cands = Seq(
      (1L, 10L, 0.99, Array(1f, 0f)),
      (1L, 11L, 0.98, Array(1f, 0.01f)),
      (1L, 12L, 0.50, Array(0f, 1f)),
      // query 2: only two candidates under m = 3 — stops early
      (2L, 20L, 0.9, Array(1f, 0f)),
      (2L, 21L, 0.8, Array(0f, 1f))
    ).toDF("qid", "id", "rel", "vec")
    val got = Retrieval.mmrRerank(cands, "qid", "id", "rel", "vec", m = 3)
      .orderBy("query_id", "mmr_rank")
      .select("query_id", "neighbor_id", "mmr_rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, 1), (1L, 12L, 2), (1L, 11L, 3),
      (2L, 20L, 1), (2L, 21L, 2)))
    // lambda = 1 degenerates to pure relevance order
    val pure = Retrieval.mmrRerank(cands, "qid", "id", "rel", "vec",
        m = 3, lambda = 1.0)
      .orderBy("query_id", "mmr_rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(pure == Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L)))
  }

  test("mmrRerank ≡ an independent in-Scala greedy reference on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 20 queries × 4-12 candidates, 4-dim random vectors, random rel
    val rows = for {
      q <- 1L to 20L
      n = 4 + rnd.nextInt(9)
      c <- 0 until n
    } yield (q, c.toLong, rnd.nextDouble(),
      Array.fill(4)(rnd.nextFloat() - 0.5f))
    val lambda = 0.7
    val m = 4
    val got = Retrieval.mmrRerank(rows.toDF("qid", "id", "rel", "vec"),
        "qid", "id", "rel", "vec", m = m, lambda = lambda)
      .select("query_id", "neighbor_id", "mmr_rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq
      }
    // reference: per query, the naive O(m·n²) greedy loop, cosines in
    // plain Scala (same formula, independent code path)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = rows.groupBy(_._1).map { case (q, cs) =>
      val cand = cs.map(c => (c._2, c._3, c._4))
      val selected = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
      (1 to math.min(m, cand.size)).foreach { _ =>
        val remaining = cand.filterNot(c => selected.exists(_._1 == c._1))
        val best = remaining.map { case (id, rel, v) =>
          val score =
            if (selected.isEmpty) rel
            else lambda * rel -
              (1 - lambda) * selected.map(s => cos(v, s._2)).max
          (id, score)
        }.minBy { case (id, s) => (-s, id) } // score desc, id asc
        val v = cand.find(_._1 == best._1).get._3
        selected += ((best._1, v))
      }
      q -> selected.map(_._1).toSeq
    }
    assert(got == want)
  }
}
