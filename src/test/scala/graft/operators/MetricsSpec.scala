package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("binaryReport: hand-checked confusion, undefined ratios are null") {
    val df = Seq((0.9, true), (0.8, false), (-0.1, true), (-0.5, false),
      (-0.2, false)).toDF("s", "l")
    val r = Metrics.binaryReport(df, "s", "l", threshold = 0.0).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((1L, 1L, 2L, 1L)))
    assert(r.getLong(4) === 0L)    // n_null
    assert(r.getDouble(5) === 0.5) // precision
    assert(r.getDouble(6) === 0.5) // recall
    assert(r.getDouble(7) === 0.5) // f1
    assert(r.getDouble(8) === 0.6) // accuracy
    // all-negative classifier: precision and f1 undefined, NOT zero
    val neg = Metrics.binaryReport(df, "s", "l", threshold = 2.0).head()
    assert(neg.isNullAt(5) && neg.isNullAt(7))
    assert(neg.getDouble(6) === 0.0) // recall defined: positives exist
    // no actual positives: recall undefined
    val nolab = Metrics.binaryReport(
      Seq((0.9, false), (-0.1, false)).toDF("s", "l"), "s", "l", 0.0).head()
    assert(nolab.isNullAt(6) && nolab.isNullAt(7))
  }

  test("binaryReport: nulls classify exhaustively; empty frame counts 0 (ADVICE r9)") {
    // a null label and a null score each land in n_null, never silently in
    // no cell — tp+fp+tn+fn+n_null must equal the row count
    val df = Seq((Some(0.9), Some(true)), (Some(0.8), None),
      (None, Some(false)), (Some(-0.5), Some(false)))
      .toDF("s", "l")
    val r = Metrics.binaryReport(df, "s", "l", threshold = 0.0).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((1L, 0L, 1L, 0L, 2L)))
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) +
      r.getLong(4) === df.count())
    // empty input: zero counts, not nulls
    val e = Metrics.binaryReport(
      Seq.empty[(Double, Boolean)].toDF("s", "l"), "s", "l", 0.0).head()
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3),
      e.getLong(4)) === ((0L, 0L, 0L, 0L, 0L)))
  }

  test("calibration: fixed-width bins, outliers clamp to edge bins") {
    val df = Seq((-5.0, false), (-0.99, false), (0.0, true), (0.5, true),
      (0.999, true), (7.0, false)).toDF("s", "l")
    val bins = Metrics.calibration(df, "s", "l", bins = 4, lo = -1.0, hi = 1.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // [-1,-0.5) bin 0 holds -5.0 (clamped) and -0.99; [0,0.5) bin 2 holds
    // 0.0; [0.5,1) bin 3 holds 0.5, 0.999, and 7.0 (clamped)
    assert(bins(0L) === ((2L, 0L, 0.0)))
    assert(bins(2L) === ((1L, 1L, 1.0)))
    assert(bins(3L) === ((3L, 2L, 2.0 / 3.0)))
    assert(!bins.contains(1L)) // empty bins don't appear
    intercept[IllegalArgumentException] {
      Metrics.calibration(df, "s", "l", bins = 0, lo = 0, hi = 1)
    }
  }
}
