package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins [[LmScore.ngramCountFeatures]] semantics on a corpus small enough
  * to count by hand: corpus bigram counts (a b)=3, (b a)=1, (b c)=1,
  * (x y)=1.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "a b a b"), // grams: (a b), (b a), (a b)
    (2L, "a b c"),   // grams: (a b), (b c)
    (3L, "x y"),     // grams: (x y)
    (4L, "z")        // too short for a bigram
  ).toDF("doc_id", "text")

  private lazy val rows: Map[Long, Row] =
    LmScore.ngramCountFeatures(corpus, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("per-doc features match hand counts") {
    val d1 = rows(1L)
    assert(d1.getAs[Long]("n_grams") === 3L)
    assert(d1.getAs[Long]("cnt_sum") === 7L)  // 3 + 1 + 3
    assert(d1.getAs[Long]("log2_sum") === 2L) // ⌊log2 3⌋ + 0 + ⌊log2 3⌋
    assert(d1.getAs[Long]("n_rare") === 1L)   // (b a) is hapax
    assert(math.abs(d1.getAs[Double]("avg_log2") - 2.0 / 3.0) < 1e-12)

    val d2 = rows(2L)
    assert(d2.getAs[Long]("n_grams") === 2L)
    assert(d2.getAs[Long]("cnt_sum") === 4L) // 3 + 1
    assert(d2.getAs[Long]("n_rare") === 1L)  // (b c)

    val d3 = rows(3L)
    assert(d3.getAs[Long]("cnt_sum") === 1L)
    assert(d3.getAs[Long]("log2_sum") === 0L)
    assert(d3.getAs[Long]("n_rare") === 1L)
  }

  test("short documents score all-zero instead of dropping out") {
    val d4 = rows(4L)
    assert(d4.getAs[Long]("n_grams") === 0L)
    assert(d4.getAs[Long]("cnt_sum") === 0L)
    assert(d4.getAs[Double]("avg_log2") === 0.0)
  }

  test("rareThreshold widens the rare gate") {
    val loose = LmScore.ngramCountFeatures(corpus, "doc_id", "text",
        n = 2, rareThreshold = 3L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_rare")).toMap
    assert(loose(1L) === 3L) // every gram has corpus count ≤ 3 now
    assert(loose(2L) === 2L)
  }

  test("common text outscores outlier text (the filter signal)") {
    val docs = (Seq.tabulate(10)(i => (i.toLong, "the cat sat on the mat")) :+
      (99L, "qwz vbn jkl ppq rrs ttu")).toDF("doc_id", "text")
    val avg = LmScore.ngramCountFeatures(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_log2")).toMap
    assert(avg(0L) > avg(99L),
      s"repeated prose ${avg(0L)} should outscore hapax soup ${avg(99L)}")
  }
}
