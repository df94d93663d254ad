package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OverlapSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("ngramOverlap: hand-computed counts on a tiny planted corpus") {
    // corpus A: "a b c d" → 2-grams {a b, b c, c d}; "x y z" → {x y, y z}
    // corpus B: "b c d e" → {b c, c d, d e}
    // intersection {b c, c d}, union {a b, b c, c d, x y, y z, d e} = 6
    val a = df(1L -> "a b c d", 2L -> "x y z")
    val b = df(3L -> "b c d e")
    val got = Overlap.ngramOverlap(a, b, "text", n = 2).head()
    assert(got.getLong(0) == 5) // n_a
    assert(got.getLong(1) == 3) // n_b
    assert(got.getLong(2) == 2) // n_common
    assert(math.abs(got.getDouble(3) - 2.0 / 6.0) < 1e-12)
  }

  test("ngramOverlap edges: identical corpora J=1, disjoint J=0, dup grams counted once") {
    val a = df(1L -> "a b c", 2L -> "a b c") // duplicate doc: distinct grams once
    val same = Overlap.ngramOverlap(a, df(3L -> "a b c"), "text", n = 2).head()
    assert(same.getLong(0) == 2 && same.getLong(1) == 2 && same.getLong(2) == 2)
    assert(same.getDouble(3) == 1.0)
    val disj = Overlap.ngramOverlap(a, df(3L -> "p q r"), "text", n = 2).head()
    assert(disj.getLong(2) == 0L && disj.getDouble(3) == 0.0)
  }

  test("ngramOverlap: gram-less corpora report zeros, not nulls (review r9)") {
    // every doc shorter than n tokens → zero gram rows reach the final agg
    val short = df(1L -> "a b", 2L -> "c")
    val got = Overlap.ngramOverlap(short, short, "text", n = 8).head()
    assert(got.getLong(0) == 0L && got.getLong(1) == 0L && got.getLong(2) == 0L)
    assert(got.getDouble(3) == 0.0)
  }

  test("ngramOverlapBy: per-group counts + containment, one-sided groups kept") {
    val a = Seq((1L, "x", "a b c d"), (2L, "y", "p q r")).toDF("id", "g", "text")
    val b = Seq((3L, "x", "b c d e"), (4L, "z", "m n o")).toDF("id", "g", "text")
    val rows = Overlap.ngramOverlapBy(a, b, "text", "g", n = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    // group x: A{a b,b c,c d} B{b c,c d,d e} → common 2, containment 2/3
    assert(rows("x") == ((3L, 3L, 2L, 2.0 / 3.0)))
    // one-sided groups survive with zero overlap (flag maxes, not joins)
    assert(rows("y") == ((2L, 0L, 0L, 0.0)))
    assert(rows("z") == ((0L, 2L, 0L, 0.0)))
  }

  test("bottom-k estimate tracks the exact corpus Jaccard on real documents") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = docs.where($"doc_id" % 2 === 0)
    val b = docs.where($"doc_id" % 2 === 1)
    val exact = Overlap.ngramOverlap(a, b, "text", n = 3)
      .head().getDouble(3)
    val est = Overlap.ngramOverlapEstimate(a, b, "text", n = 3, k = 512)
      .head().getDouble(0)
    // deterministic (no sampling randomness) — this asserts the estimator
    // stays inside ~4 standard errors (sqrt(J(1-J)/k) ≈ 0.022) of exact
    assert(math.abs(est - exact) < 0.09, s"est $est vs exact $exact")
    // and a full-size sketch IS exact: k larger than both gram sets
    val estFull = Overlap.ngramOverlapEstimate(a, b, "text", n = 3, k = 1 << 20)
      .head().getDouble(0)
    assert(math.abs(estFull - exact) < 1e-12)
  }

  test("exact-overlap plan: map-side partial aggregation ahead of the one exchange") {
    val docs = df(1L -> "a b c d e f g", 2L -> "b c d e f g h")
    val plan = Overlap.ngramOverlap(docs, docs, "text", 3)
      .queryExecution.executedPlan.toString
    // the gram stream must be reduced BEFORE it crosses the wire: a
    // partial HashAggregate under the Exchange (duplicate grams collapse
    // map-side), and exactly the gram-keyed + final single-row exchanges —
    // no join, no pairing
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
    assert(!plan.contains("Join"), s"overlap must not join:\n$plan")
    val est = Overlap.ngramOverlapEstimate(docs, docs, "text", 3, 16)
      .head().getDouble(0)
    assert(est == 1.0) // identical corpora
  }
}
