package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def hm(pairs: (String, Long)*): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pairs.foreach { case (p, c) =>
      m.put(p, java.lang.Long.valueOf(math.floor(1e6 * math.log(c.toDouble)).toLong))
    }
    m
  }

  private def sz(counts: Long*): Long =
    math.floor(1e6 * math.log(counts.sum.toDouble)).toLong

  test("viterbi picks the higher-likelihood segmentation") {
    // model a=4, b=2, ab=2 (Z=8): [ab] = ln2 - ln8 beats
    // [a,b] = ln4 + ln2 - 2 ln8
    val (toks, _) = UnigramLm.viterbiWord("ab",
      hm("a" -> 4L, "b" -> 2L, "ab" -> 2L), sz(4, 2, 2), 2)
    assert(toks.toSeq == Seq("ab"))
  }

  test("score tie breaks on fewer pieces") {
    // c_ab * Z == c_a * c_b (2*8 == 4*4) makes [ab] and [a,b] EXACTLY
    // equal in quantized score (both sides quantize the same ln inputs);
    // the 1-piece segmentation must win
    val (toks, _) = UnigramLm.viterbiWord("ab",
      hm("a" -> 4L, "b" -> 4L, "ab" -> 2L), sz(4, 4, 2), 2)
    assert(toks.toSeq == Seq("ab"))
  }

  test("score+count tie breaks on the lexicographically smaller sequence") {
    // c_ab * c_c == c_a * c_bc (2*6 == 3*4): [ab, c] and [a, bc] tie on
    // score AND token count; ["a", "bc"] joins lex-smaller than
    // ["ab", "c"] because the U+0001 separator sorts below 'b'
    val (toks, _) = UnigramLm.viterbiWord("abc",
      hm("a" -> 3L, "b" -> 1L, "c" -> 6L, "ab" -> 2L, "bc" -> 4L),
      sz(3, 1, 6, 2, 4), 2)
    assert(toks.toSeq == Seq("a", "bc"))
  }

  test("missing single-character coverage fails loudly") {
    val e = intercept[IllegalArgumentException] {
      UnigramLm.viterbiWord("axb", hm("a" -> 2L, "b" -> 2L), sz(2, 2), 2)
    }
    assert(e.getMessage.contains("axb"))
  }

  test("DP equals exhaustive enumeration on random words and models") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    for (_ <- 1 to 200) {
      val word = (1 to (1 + rnd.nextInt(9)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val maxLen = 1 + rnd.nextInt(3)
      // all singles (coverage) + random multi pieces with random counts
      val singles = alphabet.map(c => c.toString -> (1L + rnd.nextInt(50)))
      val multis = (1 to 6).map { _ =>
        val l = 2 + rnd.nextInt(math.max(1, maxLen - 1))
        (1 to l).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString ->
          (1L + rnd.nextInt(50))
      }.filter(_._1.length <= maxLen).distinctBy(_._1)
        .filterNot(p => alphabet.contains(p._1))
      val model = (singles ++ multis).toSeq
      val m = hm(model: _*)
      val z = sz(model.map(_._2): _*)

      // reference: enumerate every segmentation, pick by the documented
      // comparator — an independent recursion, not the DP
      def segs(w: String): Seq[Seq[String]] =
        if (w.isEmpty) Seq(Seq.empty)
        else (1 to math.min(maxLen, w.length)).flatMap { l =>
          val p = w.substring(0, l)
          if (m.containsKey(p)) segs(w.substring(l)).map(p +: _) else Nil
        }
      val all = segs(word)
      assert(all.nonEmpty)
      val want = all.map { ts =>
        val score = ts.map(p => m.get(p).longValue() - z).sum
        (ts, score)
      }.minBy { case (ts, score) =>
        (-score, ts.length, ts.mkString(""))
      }(Ordering.Tuple3(Ordering.Long, Ordering.Int, Ordering.String))
      val (got, gotScore) = UnigramLm.viterbiWord(word, m, z, maxLen)
      assert(got.toSeq == want._1, s"word=$word model=$model")
      assert(gotScore == want._2)
    }
  }

  test("soft forward-backward equals exhaustive posterior enumeration on random words and models") {
    // the q_unigram_soft_step oracle's arithmetic as an independent
    // in-Scala reference: enumerate EVERY segmentation, weight by
    // exp((total − best)/1e6), per-piece posterior = occurrence-weighted
    // mass over total mass — compare against the forward-backward kernel
    // to 1e-9 (the float-path bound the margin spec leans on), plus the
    // log marginal via direct summation
    val rnd = new scala.util.Random(19)
    val alphabet = "abcd"
    for (_ <- 1 to 200) {
      val word = (1 to (1 + rnd.nextInt(9)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val maxLen = 1 + rnd.nextInt(3)
      val singles = alphabet.map(c => c.toString -> (1L + rnd.nextInt(50)))
      val multis = (1 to 6).map { _ =>
        val l = 2 + rnd.nextInt(math.max(1, maxLen - 1))
        (1 to l).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString ->
          (1L + rnd.nextInt(50))
      }.filter(_._1.length <= maxLen).distinctBy(_._1)
        .filterNot(p => alphabet.contains(p._1))
      val model = (singles ++ multis).toSeq
      val m = hm(model: _*)
      val z = sz(model.map(_._2): _*)

      def segs(w: String): Seq[Seq[String]] =
        if (w.isEmpty) Seq(Seq.empty)
        else (1 to math.min(maxLen, w.length)).flatMap { l =>
          val p = w.substring(0, l)
          if (m.containsKey(p)) segs(w.substring(l)).map(p +: _) else Nil
        }
      val all = segs(word)
      assert(all.nonEmpty)
      val totals = all.map(ts => ts.map(p => m.get(p).longValue() - z).sum)
      val best = totals.max
      val weights = totals.map(t => math.exp((t - best).toDouble / 1e6))
      val wsum = weights.sum
      val want = all.zip(weights)
        .flatMap { case (ts, w) => ts.map(_ -> w) }
        .groupBy(_._1).map { case (p, ws) => p -> ws.map(_._2).sum / wsum }
      val wantLl = math.log(wsum) + best.toDouble / 1e6

      val (got, gotLl) = UnigramLm.softWordCounts(word, m, z, maxLen)
      val gotMap = got.toMap
      assert(gotMap.keySet == want.keySet, s"word=$word model=$model")
      want.foreach { case (p, e) =>
        assert(math.abs(gotMap(p) - e) < 1e-9,
          s"word=$word piece=$p soft=${gotMap(p)} enum=$e model=$model")
      }
      assert(math.abs(gotLl - wantLl) < 1e-9,
        s"word=$word ll=$gotLl enum=$wantLl")
      // posterior-mass conservation: per-position occupancy sums to 1,
      // so Σ_piece E·len(piece) = |word| exactly (up to float path)
      val mass = got.map { case (p, e) => e * p.length }.sum
      assert(math.abs(mass - word.length) < 1e-9, s"word=$word mass=$mass")
    }
  }

  test("seedVocab keeps every single char plus top multis with tie-breaks") {
    val counts = Seq(("aab", 3L), ("ab", 2L), ("ba", 2L)).toDF("word", "cnt")
    val seed = UnigramLm.seedVocab(counts, maxPieceLen = 2, seedSize = 2)
      .as[(String, Long)].collect().toMap
    // singles: a appears 2*3 + 1*2 + 1*2 = 10, b 3+2+2 = 7
    assert(seed("a") == 10L && seed("b") == 7L)
    // multis: ab = 3+2 = 5, aa = 3, ba = 2 — top 2 by (cnt desc, piece asc)
    assert(seed.keySet == Set("a", "b", "ab", "aa"))
    assert(seed("ab") == 5L && seed("aa") == 3L)
  }

  test("emStep returns word-count-weighted piece occurrence sums") {
    val counts = Seq(("ab", 3L), ("b", 2L)).toDF("word", "cnt")
    // model: ab strongly favored over a+b
    val model = Seq("a" -> 2L, "b" -> 2L, "ab" -> 50L)
    val est = UnigramLm.emStep(counts, model)
      .as[(String, Long)].collect().toMap
    assert(est == Map("ab" -> 3L, "b" -> 2L))
  }

  test("tokenCounts aggregates per document over word occurrences") {
    val docs = Seq((1L, "ab ab b"), (2L, "b")).toDF("id", "text")
    val model = Seq("a" -> 2L, "b" -> 2L, "ab" -> 50L)
    val got = UnigramLm.tokenCounts(docs, "id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._1 == 3L && got(2L)._1 == 1L) // [ab][ab][b] and [b]
    // score is additive over word occurrences: doc 1 = 2*score(ab) + score(b)
    val z = sz(2, 2, 50)
    val sAb = math.floor(1e6 * math.log(50.0)).toLong - z
    val sB = math.floor(1e6 * math.log(2.0)).toLong - z
    assert(got(1L)._2 == 2 * sAb + sB && got(2L)._2 == sB)
  }

  test("viterbiNBest equals brute-force enumeration top-N on random draws") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abc"
    for (_ <- 1 to 120) {
      val word = (1 to (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val maxLen = 1 + rnd.nextInt(3)
      val nBest = 1 + rnd.nextInt(4)
      val model = (alphabet.map(c => c.toString -> (1L + rnd.nextInt(40))) ++
        (1 to 5).map { _ =>
          val l = 2 + rnd.nextInt(math.max(1, maxLen - 1))
          (1 to l).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString ->
            (1L + rnd.nextInt(40))
        }.filter(p => p._1.length <= maxLen && p._1.length >= 2))
        .distinctBy(_._1).toSeq
      val m = hm(model: _*)
      val z = sz(model.map(_._2): _*)
      def segs(w: String): Seq[Seq[String]] =
        if (w.isEmpty) Seq(Seq.empty)
        else (1 to math.min(maxLen, w.length)).flatMap { l =>
          val p = w.substring(0, l)
          if (m.containsKey(p)) segs(w.substring(l)).map(p +: _) else Nil
        }
      val want = segs(word)
        .map(ts => (ts, ts.map(p => m.get(p).longValue() - z).sum))
        .sortBy { case (ts, sc) => (-sc, ts.length, ts.mkString("")) }(
          Ordering.Tuple3(Ordering.Long, Ordering.Int, Ordering.String))
        .take(nBest)
      val got = UnigramLm.viterbiNBest(word, m, z, maxLen, nBest)
      assert(got.map(_._1.toSeq) == want.map(_._1), s"word=$word")
      assert(got.map(_._3) == want.map(_._2))
      assert(got.head._1.toSeq ==
        UnigramLm.viterbiWord(word, m, z, maxLen)._1.toSeq)
    }
  }

  test("sampleTokenCounts with nBest=1 equals the Viterbi argmax exactly") {
    val docs = Seq((1L, "abab ab ba"), (2L, "ba abab"), (3L, "ab"))
      .toDF("id", "text")
    val model = Seq("a" -> 6L, "b" -> 5L, "ab" -> 7L, "ba" -> 3L)
    val argmax = UnigramLm.tokenCounts(docs, "id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sampled = UnigramLm
      .sampleTokenCounts(docs, "id", "text", model, nBest = 1, alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sampled == argmax)
  }

  test("sampling is seed-deterministic and seed-sensitive") {
    val docs = (1L to 40L).map(i => (i, "abab baba abba baab abab ba ab"))
      .toDF("id", "text")
    val model = Seq("a" -> 6L, "b" -> 5L, "ab" -> 7L, "ba" -> 6L, "bb" -> 2L)
    def run(seed: Long) = UnigramLm
      .sampleTokenCounts(docs, "id", "text", model, nBest = 4,
        alpha = 0.1, seed = seed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1L) == run(1L))
    assert(run(1L) != run(2L)) // 40 docs × 7 words: some draw must differ
    // identical words in one doc draw independently by position: with a
    // low alpha the repeated "abab" occurrences across 40 docs cannot all
    // pick one candidate (4-best of abab has >= 2 distinct token counts)
    val perDoc = run(1L).map(_._2)
    assert(perDoc.size > 1, "every sampled doc scored identically — " +
      "position is not entering the draw")
  }

  test("sampling rejects documents beyond the 4096-word position budget") {
    val docs = Seq((1L, ("ab " * 5000).trim)).toDF("id", "text")
    val model = Seq("a" -> 2L, "b" -> 2L, "ab" -> 3L)
    val e = intercept[Exception] {
      UnigramLm.sampleTokenCounts(docs, "id", "text", model, nBest = 2)
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("train is deterministic, respects vocabSize, and never drops singles") {
    val docs = Seq(
      "the cat sat on the mat", "the cat ran", "a cat and a mat",
      "the the the cat cat mat").toDF("text")
    val m1 = UnigramLm.train(docs, "text", vocabSize = 14,
      maxPieceLen = 3, seedSize = 20, emIters = 3)
    val m2 = UnigramLm.train(docs, "text", vocabSize = 14,
      maxPieceLen = 3, seedSize = 20, emIters = 3)
    assert(m1 == m2)
    assert(m1.size <= 14)
    val singles = "thecasonmrd".toSet.map((c: Char) => c.toString)
    assert(singles.subsetOf(m1.map(_._1).toSet))
    // the trained model must still cover serving end-to-end
    val served = UnigramLm.tokenCounts(docs.withColumn("id",
        monotonically_increasing_id()), "id", "text", m1)
    assert(served.count() == 4)
    // subword compression: trained tokens strictly fewer than characters
    val nChars = docs.select(sum(length(regexp_replace(col("text"),
      "\\s+", ""))).cast("long")).head().getLong(0)
    val nToks = served.select(sum(col("n_tokens"))).head().getLong(0)
    assert(nToks < nChars, s"$nToks tokens vs $nChars chars")
  }

  test("hard-EM does not decrease corpus likelihood on the fixed corpus") {
    val docs = Seq(
      "abab abab baba", "ab ab ab ba", "aabb abab", "baba baba abab"
    ).toDF("text").withColumn("id", monotonically_increasing_id())
    def corpusScore(model: Seq[(String, Long)]): Long =
      UnigramLm.tokenCounts(docs, "id", "text", model)
        .select(sum(col("score_micro"))).head().getLong(0)
    val counts = BpeTrain.wordCounts(docs, "text")
    val seed = UnigramLm.seedVocab(counts, maxPieceLen = 3, seedSize = 10)
      .as[(String, Long)].collect().toSeq
    val after = UnigramLm.train(docs, "text",
      vocabSize = seed.size, maxPieceLen = 3, seedSize = 10, emIters = 2,
      pruneFraction = 0.0)
    assert(corpusScore(after) >= corpusScore(seed))
  }

  test("vocabSize below single-character coverage fails loudly") {
    val docs = Seq("abcdefgh ijklmnop").toDF("text")
    val e = intercept[IllegalArgumentException] {
      UnigramLm.train(docs, "text", vocabSize = 3, maxPieceLen = 2,
        seedSize = 5)
    }
    assert(e.getMessage.contains("coverage"))
  }

  test("soft E-step equals hard E-step on a single-segmentation lattice") {
    // model {ab, c} admits exactly one segmentation of 'abc' (no singles
    // a/b, so nothing else parses): posterior mass 1 on every occurrence,
    // soft expected counts = hard Viterbi counts exactly (after the ulp
    // the scaladoc bounds)
    val counts = Seq(("abc", 3L)).toDF("word", "cnt")
    val model = Seq(("ab", 2L), ("c", 1L))
    val hard = UnigramLm.emStep(counts, model)
      .as[(String, Long)].collect().toMap
    val soft = UnigramLm.emStepSoft(counts, model)
      .as[(String, Double)].collect().toMap
    assert(hard == Map("ab" -> 3L, "c" -> 3L))
    assert(soft.keySet == hard.keySet)
    soft.foreach { case (p, e) =>
      assert(math.abs(e - hard(p)) < 1e-9, s"piece $p: soft $e vs hard ${hard(p)}")
    }
  }

  test("soft E-step retains posterior mass hard EM starves to zero") {
    // 'ab' under {a:4, b:4, ab:2} (Z=10): Viterbi picks [ab]
    // (0.2 > 0.16), so hard EM gives a and b NOTHING; soft EM splits
    // 0.2/0.36 vs 0.16/0.36 and keeps the singles alive — the exact
    // behavioral difference that motivates expected-count EM
    val counts = Seq(("ab", 9L)).toDF("word", "cnt")
    val model = Seq(("a", 4L), ("b", 4L), ("ab", 2L))
    val hard = UnigramLm.emStep(counts, model)
      .as[(String, Long)].collect().toMap
    val soft = UnigramLm.emStepSoft(counts, model)
      .as[(String, Double)].collect().toMap
    assert(hard == Map("ab" -> 9L))
    // P([ab]) = 0.2/0.36, P([a,b]) = 0.16/0.36 (quantization shifts the
    // ratio by < 1e-5)
    assert(math.abs(soft("ab") - 9.0 * (0.2 / 0.36)) < 1e-3)
    assert(math.abs(soft("a") - 9.0 * (0.16 / 0.36)) < 1e-3)
    assert(soft("a") == soft("b"))
  }

  test("soft EM does not decrease the corpus log marginal likelihood") {
    // counts in the hundreds so floor(x+0.5) integerization perturbs the
    // exact-EM update only in the 4th digit — monotonicity survives
    val docs = Seq(
      (1L, ("abab " * 100).trim), (2L, ("abc " * 70).trim),
      (3L, ("bcbc " * 50).trim), (4L, ("aab bba cab " * 30).trim)
    ).toDF("id", "text")
    val counts = BpeTrain.wordCounts(docs, "text").localCheckpoint(true)
    try {
      var model = UnigramLm.seedVocab(counts, maxPieceLen = 3, seedSize = 12)
        .as[(String, Long)].collect().toSeq
      val singles = model.filter(_._1.length == 1).map(_._1).toSet
      var ll = UnigramLm.logLikelihood(counts, model)
      for (_ <- 1 to 3) {
        val est = UnigramLm.emStepSoft(counts, model)
          .as[(String, Double)].collect()
          .map { case (p, e) => (p, math.floor(e + 0.5).toLong) }
          .filter(_._2 >= 1L).toMap
        model = singles.toSeq.sorted.map(p => (p, math.max(est.getOrElse(p, 0L), 1L))) ++
          model.filter(p => p._1.length >= 2 && est.contains(p._1))
            .map(p => (p._1, est(p._1)))
        val next = UnigramLm.logLikelihood(counts, model)
        assert(next >= ll - 1e-3,
          s"soft-EM objective decreased: $ll -> $next")
        ll = next
      }
    } finally counts.unpersist()
  }

  test("trainSoft equals train at the single-segmentation degenerate config") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "a cat and a hat"), (3L, "the bat sat pat")
    ).toDF("id", "text")
    val hard = UnigramLm.train(docs, "text", vocabSize = 50,
      maxPieceLen = 1, seedSize = 1, emIters = 2, pruneFraction = 0.0)
    val soft = UnigramLm.trainSoft(docs, "text", vocabSize = 50,
      maxPieceLen = 1, seedSize = 1, emIters = 2, pruneFraction = 0.0)
    assert(soft == hard)
    assert(soft.nonEmpty)
  }

  test("trainSoft diverges from train where the lattice is ambiguous") {
    // the q_unigram gate config on an ambiguous corpus: soft EM keeps
    // fractional support hard EM zeroes, so the fitted counts differ
    val docs = Seq(
      (1L, ("abab abab cab " * 20).trim), (2L, ("ab ab ba cabab " * 20).trim)
    ).toDF("id", "text")
    val hard = UnigramLm.train(docs, "text", vocabSize = 40,
      maxPieceLen = 3, seedSize = 10, emIters = 2, pruneFraction = 0.0)
    val soft = UnigramLm.trainSoft(docs, "text", vocabSize = 40,
      maxPieceLen = 3, seedSize = 10, emIters = 2, pruneFraction = 0.0)
    assert(hard != soft,
      "soft and hard EM agreed on an ambiguous corpus — the soft E-step " +
        "is not contributing fractional mass")
  }
}
