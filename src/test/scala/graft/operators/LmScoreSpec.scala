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
}
