package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[Dedup.duplicatedSpans]] / [[Dedup.removeDuplicatedSpans]] — the
  * ExactSubstr-style substring dedup (Lee et al. 2022) — on a planted
  * corpus with hand-computable 3-gram spans:
  *
  *   - doc 1/2 share the 5-token run "a b c d e" (cross-doc duplication)
  *   - doc 3 repeats its own opening 5 tokens (within-doc duplication)
  *   - doc 4 is unique; doc 7 is shorter than a gram
  *   - docs 5/6 are identical — full-document duplication
  */
class DuplicatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "x y a b c d e q2 r2 s2"),
    (3L, "p q r s t p q r s t u v"),
    (4L, "completely unique words here only once nothing repeats at all"),
    (5L, "z z1 z2 z3"),
    (6L, "z z1 z2 z3"),
    (7L, "a b")
  ).toDF("doc_id", "text")

  private def spansOf(keepFirst: Boolean = false): Map[Long, Seq[(Long, Long)]] =
    Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 3,
        keepFirst = keepFirst)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3)).sorted.toSeq).toMap

  test("cross-doc, within-doc, and full-doc spans merge to maximal ranges") {
    val spans = spansOf()
    // doc 1: grams 0..2 duplicated in doc 2 -> one span [0, 5)
    assert(spans(1L) == Seq((0L, 5L)))
    // doc 2: the shared run sits at tokens 2..6 -> [2, 7)
    assert(spans(2L) == Seq((2L, 7L)))
    // doc 3: self-repeat marks 0,1,2 and 5,6,7; gap 3 <= gramLen merges
    // the adjacent duplicated regions -> [0, 10)
    assert(spans(3L) == Seq((0L, 10L)))
    // identical docs 5/6: every gram duplicated -> whole-doc spans
    assert(spans(5L) == Seq((0L, 4L)))
    assert(spans(6L) == Seq((0L, 4L)))
    // unique and sub-gram docs produce nothing
    assert(!spans.contains(4L) && !spans.contains(7L))
  }

  test("keepFirst exempts the (doc, pos)-minimal occurrence of every gram") {
    val spans = spansOf(keepFirst = true)
    // doc 1 holds the first occurrence of all three shared grams -> clean
    assert(!spans.contains(1L))
    // doc 2's copies are still marked
    assert(spans(2L) == Seq((2L, 7L)))
    // doc 3: first copy (grams 0..2) survives, repeat (5..7) marked
    assert(spans(3L) == Seq((5L, 10L)))
    // doc 5 is the first copy of the 5/6 pair; doc 6 still fully marked
    assert(!spans.contains(5L))
    assert(spans(6L) == Seq((0L, 4L)))
  }

  test("removal reconstructs the surviving tokens exactly") {
    val clean = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", gramLen = 3)
      .as[(Long, String)].collect().toMap
    assert(clean(1L) == "f g h")
    assert(clean(2L) == "x y q2 r2 s2")
    assert(clean(3L) == "u v")
    assert(clean(4L) == "completely unique words here only once nothing repeats at all")
    // fully-duplicated docs come back EMPTY, not dropped
    assert(clean(5L) == "")
    assert(clean(6L) == "")
    assert(clean(7L) == "a b")
  }

  test("removal with keepFirst leaves one copy of every duplicated passage") {
    val clean = Dedup.removeDuplicatedSpans(docs, "doc_id", "text",
        gramLen = 3, keepFirst = true)
      .as[(Long, String)].collect().toMap
    assert(clean(1L) == "a b c d e f g h") // first copy intact
    assert(clean(2L) == "x y q2 r2 s2")
    assert(clean(3L) == "p q r s t u v") // repeat [5,10) cut; unique tail survives
    assert(clean(5L) == "z z1 z2 z3")
    assert(clean(6L) == "")
  }

  test("every originally-marked gram position falls inside a span") {
    // the span merge may only WIDEN coverage (merging), never lose a
    // marked position — the removal guarantee the operator exists for
    val spans = spansOf()
    val gramLen = 3
    val marked = Map(
      1L -> Seq(0, 1, 2), 2L -> Seq(2, 3, 4),
      3L -> Seq(0, 1, 2, 5, 6, 7), 5L -> Seq(0, 1), 6L -> Seq(0, 1))
    marked.foreach { case (doc, positions) =>
      positions.foreach { p =>
        assert(spans(doc).exists { case (s, e) => p >= s && p + gramLen <= e },
          s"doc $doc gram at $p not covered")
      }
    }
  }

  test("result is partition-invariant and deterministic") {
    val a = Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 3)
      .collect().toSet
    val b = Dedup.duplicatedSpans(docs.repartition(7), "doc_id", "text",
      gramLen = 3).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("lossy parameters are rejected loudly") {
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(docs, "doc_id", "text", minOccurrences = 1)
    }
  }
}
