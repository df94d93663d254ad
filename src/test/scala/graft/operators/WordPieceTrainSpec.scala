package graft.operators

import graft.SparkSpec

class WordPieceTrainSpec extends SparkSpec {
  import spark.implicits._

  test("likelihood argmax diverges from BPE's frequency argmax") {
    // pairs: (a,a) c=3, (a,b) c=1; symbols: a=7, b=1.
    // BPE picks (a,a) (3 > 1). WordPiece: q(a,a) = floor(3e12/49) < q(a,b)
    // = floor(1e12/7) — the rare-but-cohesive pair merges first.
    val corpus = Seq("aa aa aa ab").toDF("text")
    val bpe = BpeTrain.train(corpus, "text", numMerges = 1)
      .select("l", "r").as[(String, String)].head()
    val wp = WordPieceTrain.train(corpus, "text", numMerges = 1)
      .select("l", "r").as[(String, String)].head()
    assert(bpe == (("a", "a")))
    assert(wp == (("a", "b")))
  }

  test("learned table matches a step-recomputing in-Scala reference") {
    // reference: recompute pair and symbol statistics FROM SCRATCH each
    // merge (no incremental maintenance) with the same quantized score
    // and tie-breaks — if the maintained deltas drift, the tables differ
    def reference(words: Map[String, Long], merges: Int)
        : Seq[(String, String, Long, Long)] = {
      var vocab: Map[Vector[String], Long] = words.toSeq
        .map { case (w, c) => w.map(_.toString).toVector -> c }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val out = Seq.newBuilder[(String, String, Long, Long)]
      for (_ <- 1 to merges) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        val syms = scala.collection.mutable.Map.empty[String, Long]
        vocab.foreach { case (ss, c) =>
          ss.foreach(s => syms(s) = syms.getOrElse(s, 0L) + c)
          ss.zip(ss.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + c)
        }
        if (pairs.nonEmpty) {
          val scored = pairs.toSeq.map { case ((l, r), c) =>
            (l, r, c, math.floor((c.toDouble * 1e12) /
              (syms(l).toDouble * syms(r).toDouble)).toLong)
          }
          val (l, r, c, q) = scored.minBy { case (pl, pr, _, pq) =>
            (-pq, pl, pr)
          }(Ordering.Tuple3(Ordering.Long, Ordering.String, Ordering.String))
          out += ((l, r, q, c))
          def fuse(ss: Vector[String]): Vector[String] = {
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < ss.length) {
              if (i < ss.length - 1 && ss(i) == l && ss(i + 1) == r) {
                b += l + r; i += 2
              } else { b += ss(i); i += 1 }
            }
            b.result()
          }
          vocab = vocab.toSeq.map { case (ss, c2) => fuse(ss) -> c2 }
            .groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(21)
    for (trial <- 1 to 6) {
      val words = (1 to 25).map { _ =>
        val len = 2 + rnd.nextInt(5)
        (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.groupBy(identity).map { case (w, g) =>
        w -> (g.size.toLong * (1 + rnd.nextInt(4)))
      }
      val counts = words.toSeq.toDF("word", "cnt")
      val got = WordPieceTrain.trainFromCounts(counts, numMerges = 5)
        .orderBy("rank").select("l", "r", "score_q", "pair_count")
        .as[(String, String, Long, Long)].collect().toSeq
      assert(got == reference(words, 5), s"trial $trial: $words")
    }
  }

  test("serving under the learned table: fold and compiled automaton agree") {
    val corpus = Seq("the cat sat", "the mat", "that cat", "the the cat")
      .toDF("text").withColumn("id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
    val merges = WordPieceTrain.train(corpus, "text", numMerges = 4)
      .orderBy("rank").select("l", "r")
      .as[(String, String)].collect().toSeq
    val fold = BpeTrain.tokenCounts(corpus, "id", "text", merges)
      .as[(Long, Long)].collect().toMap
    val compiled = BpeTrain.tokenCountsCompiled(corpus, "id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(fold == compiled) // trainer-consistent by creation order
    assert(fold.values.sum < corpus.as[(String, Long)].collect()
      .map(_._1.replaceAll("\\s+", "").length).sum) // compresses
  }

  test("exhaustion stops early: merges stop when one symbol remains") {
    val got = WordPieceTrain.train(Seq("ab ab").toDF("text"), "text",
      numMerges = 5).count()
    assert(got === 1L) // (a,b) merges; no adjacent pair remains
  }
}
