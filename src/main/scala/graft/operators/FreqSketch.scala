package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions.fnv_token_hashes
import graft.functions.SketchOps

/** Count-min frequency sketch (Cormode & Muthukrishnan 2005) over a token
  * stream — the bounded-memory member of the sketch family next to the
  * HLL distinct sketch and the fixed-bin quantile sketch: d×w counters
  * answer "how often does term t occur?" with one-sided error
  * (estimate ≥ truth, overshoot ≤ εN with probability 1−δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉), regardless of vocabulary size.
  *
  * Why it earns its place next to the EXACT `q_text_vocab_topk` path: the
  * exact count table is itself a fine distributed aggregation, but its
  * size is the vocabulary — a multilingual 100 TB crawl holds billions of
  * distinct tokens, and every downstream consumer of "frequency of X"
  * then joins against a billion-row table. The sketch is d·w longs
  * (kilobytes), ships to the driver or a broadcast, and answers point
  * queries map-side.
  *
  * Everything is deterministic and merge-order-invariant: counters are
  * SUMS (addition commutes — unlike SpaceSaving, whose state depends on
  * arrival order), the d row-hash functions are seeded splitmix64
  * affine maps over the FNV token hash (pure int64 arithmetic an
  * external engine replays — same discipline as [[Sampling]]), and
  * merging two corpora's sketches is elementwise addition.
  *
  * Scale shape: one token explode (needed by any frequency pass) →
  * d rows per token via a literal seq explode → ONE partial-aggregating
  * groupBy on (row, bucket): the exchange carries at most d·w groups per
  * map task, never the vocabulary.
  */
object FreqSketch {

  /** Per-row affine spread constants, driver-computed and plan-literal —
    * the same splitmix64 channel the sampling hashes use, and the same
    * overflow-FREE discipline: the token hash reduces to its low 31 bits
    * first (2^31 divides 2^64, so the signed pmod equals the unsigned
    * residue), then a ≤2^31 odd multiplier and addend keep every
    * intermediate under 2^63 — no wrap anywhere, which both ANSI-mode
    * Spark (overflow is an ERROR) and a plain-UBIGINT SQL replay require.
    */
  private[graft] val HashMod = 1L << 31
  private[graft] def rowMul(row: Int): Long =
    (SketchOps.splitmix64(7700L + row) & (HashMod - 1)) | 1L
  private[graft] def rowAdd(row: Int): Long =
    SketchOps.splitmix64(8800L + row) & (HashMod - 1)

  /** The (row, bucket) → count table of a d×w count-min sketch over the
    * whitespace tokens of `textCol` (FNV token-hash contract shared with
    * every other text kernel). `w` must be a power of two: the bucket is
    * an unsigned mod, and power-of-two moduli are the ones signed pmod
    * reproduces across engines (see [[SketchOps.hashedBowScore]]).
    * Missing (row, bucket) pairs are zero counters — readers treat
    * absence as 0.
    */
  def countMin(df: DataFrame, textCol: String, d: Int, w: Int): DataFrame = {
    require(d > 0, s"d must be positive, got $d")
    require(w > 0 && (w & (w - 1)) == 0, s"w must be a power of two, got $w")
    val rows = (0 until d).map { r =>
      struct(lit(r).alias("row"),
        pmod(pmod(col("_h"), lit(HashMod)) * rowMul(r) + rowAdd(r),
          lit(w.toLong)).alias("bucket"))
    }
    df.select(explode(fnv_token_hashes(col(textCol))).alias("_h"))
      .select(explode(array(rows: _*)).alias("_rb"))
      .groupBy(col("_rb.row").alias("row"), col("_rb.bucket").alias("bucket"))
      .agg(count(lit(1)).alias("cnt"))
  }

  /** Point estimates for `terms` against a sketch: min over the d rows of
    * the term's counters (absent counter = 0). The candidate list is tiny
    * by contract (a report's worth of terms) and broadcasts; the sketch
    * itself is ≤ d·w rows. One-sided: estimate ≥ true count always.
    */
  def estimate(sketch: DataFrame, terms: Seq[String], d: Int, w: Int): DataFrame = {
    require(terms.nonEmpty, "terms must not be empty")
    val spark = sketch.sparkSession
    import spark.implicits._
    val probe = terms.distinct.flatMap { t =>
      val h = SketchOps.fnvTokenHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).getLong(0)
      (0 until d).map { r =>
        val hm = ((h % HashMod) + HashMod) % HashMod
        val b = (hm * rowMul(r) + rowAdd(r)) % w
        (t, r, b)
      }
    }.toDF("term", "row", "bucket")
    broadcast(probe)
      .join(sketch, Seq("row", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).alias("est"))
  }
}
