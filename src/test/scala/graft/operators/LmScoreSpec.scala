package graft.operators

import graft.SparkSpec

/** Bigram-LM scoring (r14): the add-one-smoothed probabilities and the
  * per-document averages against hand arithmetic, plus the unseen-context
  * floor and the reference-corpus (train ≠ score) path.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // V = {a, b, c, x} = 4; pair counts (a,b)=3 (b,a)=1 (b,c)=1;
  // context counts a=3 b=2
  private lazy val corpus = Seq(
    (1L, "a b a b"), (2L, "a b c"), (3L, "x")
  ).toDF("doc_id", "text")

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("self-trained scores equal hand arithmetic; <2-token docs are omitted") {
    val got = scores(LmScore.scoreByBigramLm(corpus, "doc_id", "text"))
    val pAB = 4.0 / 7.0 // (3+1)/(3+4)
    val pBA = 2.0 / 6.0 // (1+1)/(2+4)
    val pBC = 2.0 / 6.0
    assert(got.keySet === Set(1L, 2L), "the 1-token doc has no bigram")
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 -
      -(2 * math.log(pAB) + math.log(pBA)) / 3) < 1e-12)
    assert(got(2L)._1 === 2L)
    assert(math.abs(got(2L)._2 -
      -(math.log(pAB) + math.log(pBC)) / 2) < 1e-12)
  }

  test("unseen context scores the 1/V smoothing floor; train and score corpora can differ") {
    val novel = Seq((9L, "z z z")).toDF("doc_id", "text")
    val got = scores(LmScore.scoreByBigramLm(novel, "doc_id", "text",
      train = Some(corpus)))
    // P(z|z) = (0+1)/(0+4): neither the pair nor the context was trained
    assert(got(9L)._1 === 2L)
    assert(math.abs(got(9L)._2 - math.log(4.0)) < 1e-12)
  }

  test("fluent-vs-noise ordering: in-domain text outscores shuffled vocabulary") {
    // 40 docs of a repetitive in-domain phrase vs 2 of rare transitions:
    // the filter's point is the ORDERING, so pin it
    val repeat = (0 until 40).map(i => (i.toLong, "the cat sat on the mat"))
    val noise = Seq((100L, "mat the on cat the sat"), (101L, "sat mat cat on"))
    val df = (repeat ++ noise).toDF("doc_id", "text")
    val got = scores(LmScore.scoreByBigramLm(df, "doc_id", "text"))
    val fluent = got(0L)._2
    assert(Seq(100L, 101L).forall(got(_)._2 > fluent),
      s"noise must score a higher avg_nll than the dominant phrasing: $got")
  }

  test("shuffle-join model path (broadcastModel = false) is identical") {
    val b = scores(LmScore.scoreByBigramLm(corpus, "doc_id", "text"))
    val s = scores(LmScore.scoreByBigramLm(corpus, "doc_id", "text",
      broadcastModel = false))
    assert(b === s)
  }

  test("perplexityBuckets: head is the most fluent tercile, sizes balance, scoreless docs are absent") {
    // 9 scoreable docs with clearly separated fluency bands: three
    // in-domain repeats (low nll under the self-trained model), three
    // mixed, three with rare transitions (high nll) — plus a 1-token doc
    // that must be absent
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b a b"), (3L, "a b a b a b a b"),
      (4L, "a b c a b"), (5L, "a b c"), (6L, "c a b"),
      (7L, "x c b a"), (8L, "b c x a"), (9L, "c x b a"),
      (10L, "solo")
    ).toDF("doc_id", "text")
    val got = LmScore.perplexityBuckets(docs, "doc_id", "text")
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(got.keySet == (1L to 9L).toSet, "scoreless doc leaked in or a scored one vanished")
    val byBucket = got.values.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").size == 3 && byBucket("tail").size == 3,
      s"terciles did not balance on 9 separated scores: ${byBucket.view.mapValues(_.size).toMap}")
    // every head score strictly below every middle, every middle below tail
    assert(byBucket("head").max < byBucket("middle").min)
    assert(byBucket("middle").max < byBucket("tail").min)
    // the in-domain repeats land in head
    Seq(1L, 2L, 3L).foreach(id => assert(got(id)._2 == "head", s"doc $id: ${got(id)}"))
    // guard rails
    intercept[IllegalArgumentException](
      LmScore.perplexityBuckets(docs, "doc_id", "text",
        fractions = Seq(0.5), labels = Seq("a", "b", "c")))
    intercept[IllegalArgumentException](
      LmScore.perplexityBuckets(docs, "doc_id", "text",
        fractions = Seq(0.7, 0.3), labels = Seq("a", "b", "c")))
  }

  test("perplexityBuckets: custom fractions/labels and a separate train corpus compose") {
    val train = Seq((100L, "a b a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "a x"), (4L, "x b"))
      .toDF("doc_id", "text")
    val got = LmScore.perplexityBuckets(docs, "doc_id", "text",
        train = Some(train), fractions = Seq(0.5),
        labels = Seq("keep", "drop"))
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == "keep", got) // the train-domain doc is most fluent
    assert(got.values.count(_ == "keep") == 2 &&
      got.values.count(_ == "drop") == 2)
  }

  test("perplexityBuckets: the approx-cuts hatch assigns identically on well-separated scores") {
    // at accuracy 10000 over 9 docs the GK sketch is exact — the hatch
    // must produce the same buckets as the exact path (the scale seam is
    // memory, not semantics)
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b a b"), (3L, "a b a b a b a b"),
      (4L, "a b c a b"), (5L, "a b c"), (6L, "c a b"),
      (7L, "x c b a"), (8L, "b c x a"), (9L, "c x b a")
    ).toDF("doc_id", "text")
    def buckets(acc: Int) =
      LmScore.perplexityBuckets(docs, "doc_id", "text",
          approxCutsAccuracy = acc)
        .as[(Long, Long, Double, String)].collect()
        .map(r => r._1 -> r._4).toMap
    assert(buckets(10000) == buckets(0))
    intercept[IllegalArgumentException](
      LmScore.perplexityBuckets(docs, "doc_id", "text",
        approxCutsAccuracy = -1))
  }
}
