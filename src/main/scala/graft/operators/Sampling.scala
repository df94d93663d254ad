package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing — the curation step every
  * LLM training pipeline runs between cleaning and sharding (per-source
  * quotas, upweight/downsample by domain or language; the reference has no
  * analog, this extends SURVEY.md §2's pipeline surface like Splits/Shards).
  *
  * Everything here derives from a multiplicative integer hash of the
  * document id rather than `rand(seed)`: Spark's rand draws depend on
  * partition layout, so a repartition (or a 1000-executor cluster vs
  * local[32]) changes the sample. The hash is pure int64 arithmetic —
  * the same rows are selected in any engine at any parallelism, which is
  * what makes the gates below oracle-checkable and a 100 TB re-run
  * byte-reproducible.
  */
object Sampling {
  private val Knuth = 2654435761L   // floor(2^32 / golden ratio), Knuth §6.4
  private val Knuth2 = 2246822519L  // second mix constant (xxHash PRIME32_2)
  private val P1 = 2147483629L      // largest prime < 2^31
  private val P2 = 2147483587L      // next prime down
  private val Bucket = 4294967296L  // 2^32
  private val SeedMask = (1L << 31) - 1

  /** Seed-derived spread constants, computed DRIVER-side (plain Scala) and
    * embedded as plan literals — so the per-row arithmetic stays pure int64
    * and any engine (the DuckDB oracle included) reproduces it from the
    * two numbers alone. `seedA` enters the hash by XOR with the id,
    * `seedB` additively: a seed that only enters as `f(id + seed)` makes
    * every reseed a pure TRANSLATION of the selected-id set
    * (S(seed+d) = S(seed) − d) no matter how non-linear f is — the XOR
    * channel is what makes reseeding an actual re-deal (review finding r8).
    */
  private[graft] def seedA(seed: Long): Long =
    graft.functions.SketchOps.splitmix64(seed) & SeedMask
  private[graft] def seedB(seed: Long): Long =
    graft.functions.SketchOps.splitmix64(seed ^ 0x5deece66dL) & SeedMask

  /** Reproducible per-row uniform in [0,1): two residues of the id (one
    * XOR-spread, one translated — mod two ~2^31 primes), each spread by a
    * multiplicative constant mod 2^32, then XOR-folded and avalanched by a
    * final odd multiplier. Identical in any engine: every intermediate fits
    * int64 ((2^31)·K < 2^63 — no overflow, no float ambiguity), which is
    * what DuckDB-oracle reproducibility requires. Combining TWO residues
    * matters: one `(id % p) * K` hash repeats with period p, so a corpus
    * beyond p ids would sample in arithmetic progressions; the pair has
    * period p1·p2 ≈ 4.6e18 — the full practical id space. XOR-folding
    * (not adding) matters too: for ids below 2^31 both residues are linear
    * maps of the id, and their SUM stays linear with an even combined
    * multiplier — quantized outputs and delta-reseeds that merely shift
    * the sample (review finding r8); the xor-fold + odd-multiplier
    * avalanche is non-linear over the full id range. Ample mixing for
    * rate/quota sampling; NOT a cryptographic source.
    */
  def uniform(idCol: Column, seed: Long): Column =
    residue32(idCol, seed).cast("double") / lit(Bucket.toDouble)

  /** The integer 32-bit residue behind [[uniform]] — the shuffle key for
    * [[shuffled]], which needs exact integer comparisons with id
    * tie-breaks rather than the divided double.
    */
  private def residue32(idCol: Column, seed: Long): Column = {
    val r1 = pmod(pmod(idCol.bitwiseXOR(lit(seedA(seed))), lit(P1)) * lit(Knuth),
      lit(Bucket))
    val r2 = pmod(pmod(idCol + lit(seedB(seed)), lit(P2)) * lit(Knuth2),
      lit(Bucket))
    pmod(pmod(r1.bitwiseXOR(r2), lit(P1)) * lit(Knuth), lit(Bucket))
  }

  /** Deterministic global corpus SHUFFLE with materialized 0-based
    * positions — the training-order step between curation and write-out
    * (a corpus written in crawl/source order trains on correlated
    * batches; the fix is a seeded permutation, not `rand()`, which
    * changes with partition layout). Order = (hash residue, id): a
    * pseudorandom total order that is partition-layout-invariant and
    * engine-independent — the gate hash-checks exact positions against
    * DuckDB's `row_number()` over the same arithmetic.
    *
    * Scale shape: positions come from the [[Shards]]-style
    * literal-boundary prefix sum, with one improvement the residue makes
    * possible — the cuts are FIXED equi-spaced literals over [0, 2^32)
    * (the key is uniform by construction), so there is no quantile scan
    * at all and bucket balance is automatic. One P-row count shuffle +
    * one partitioned window; no global `Window.orderBy`, no sampled
    * `repartitionByRange` (both rejected in Shards' doc for the same
    * reasons).
    */
  def shuffled(df: DataFrame, idCol: String, seed: Long = 0L,
      posCol: String = "shuffle_pos"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val key = residue32(idAsLong(df, idCol), seed)
    val p = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val cuts = (1 until p).map(i => Bucket.toDouble * i / p)
    val bucket =
      if (cuts.isEmpty) lit(0)
      else size(filter(array(cuts.map(lit): _*), c => key.cast("double") > c))
    val totals = df.select(bucket.alias("_pid"))
      .groupBy(col("_pid")).agg(count(lit(1)).alias("_n"))
    val offsets = totals // ≤P rows: the single-partition window is trivial
      .withColumn("_offset", coalesce(
        sum(col("_n")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_offset"))
    val runW = Window.partitionBy(col("_pid")).orderBy(key, col(idCol))
    df.withColumn("_pid", bucket)
      .withColumn("_rn", row_number().over(runW))
      .join(broadcast(offsets), "_pid")
      .withColumn(posCol, (col("_offset") + col("_rn") - 1).cast(LongType))
      .drop("_pid", "_rn", "_offset")
  }

  /** The id column as an int64 hash input — the fail-loud dispatch that
    * keeps a 100 TB curation run from silently producing an empty corpus:
    * r7 shipped `col(idCol)` straight into the arithmetic, so a STRING key
    * ("doc-00017", a UUID) cast to NULL, `where(NULL < rate)` dropped every
    * row, and no error surfaced. Integral/decimal ids pass through (the
    * DuckDB-reproducible fast path the oracle gates use); string ids hash
    * via xxhash64 into [0, 2^48) — deterministic and partition-invariant,
    * though not expressible in the SQL oracle; anything else (a float id
    * would silently collapse distinct ids under truncation, a binary id
    * would cast to NULL) raises immediately.
    */
  private[graft] def idAsLong(df: DataFrame, idCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => col(idCol).cast("long")
      // precision ≤ 18 provably fits a long; wider scale-0 decimals (128-bit
      // snowflake ids) would cast to NULL past 2^63 — the silent-empty-
      // sample failure this dispatch exists to prevent — so they take the
      // hash path instead (decimal toString is canonical digits,
      // deterministic)
      case d: DecimalType if d.scale == 0 && d.precision <= 18 =>
        col(idCol).cast("long")
      case d: DecimalType if d.scale == 0 =>
        pmod(xxhash64(col(idCol).cast("string")), lit(1L << 48))
      case StringType => pmod(xxhash64(col(idCol)), lit(1L << 48))
      case dt => throw new IllegalArgumentException(
        s"Sampling id column '$idCol' must be an integral, scale-0 decimal, " +
          s"or string type, got $dt — a lossy or NULL-producing cast here " +
          "silently empties the sample")
    }
  }

  /** Weight-column guard for the rate derivations: the totals are summed
    * as longs and the oracles sum native values casting only the TOTAL
    * (`sum(n_chars)::BIGINT`), so the two agree only when every element
    * is already integral — a DOUBLE weight would truncate per-row here
    * and round once there, silently diverging every rate (ADVICE r15).
    * Same fail-loud dispatch discipline as [[idAsLong]].
    *
    * Float/double columns are accepted when every VALUE is provably
    * integral (the per-row round-trip check `w = floor(w)`, compiled into
    * the plan); the first fractional value raises at runtime with the
    * offending value in the message. This keeps the r15 fail-loud
    * contract — silent per-row truncation stays impossible — without
    * breaking callers whose double-typed weights are integers in disguise
    * (a parquet writer that widened an int column, ADVICE r16).
    */
  private def weightAsLong(df: DataFrame, weightCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(weightCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(weightCol).cast("long")
      case d: DecimalType if d.scale == 0 && d.precision <= 18 =>
        col(weightCol).cast("long")
      case FloatType | DoubleType =>
        val c = col(weightCol).cast(DoubleType)
        // provably-integral only: the round-trip check, bounded to the
        // 2^53 range where a double can represent an exact integer at
        // all (beyond it the long cast is silently lossy, and NaN/Inf —
        // which compare equal to their own floor under Spark's NaN
        // semantics — fall to the loud branch via the bound)
        val exact = c === floor(c) && abs(c) <= lit(9007199254740992.0)
        when(c.isNull || exact, c.cast(LongType))
          .otherwise(raise_error(format_string(
            s"non-integral weight in '$weightCol': %s — pre-round to an " +
              "integer unit (chars, tokens, bytes) upstream, or keep an " +
              "integral-valued column", c)))
          .cast(LongType)
      case dt => throw new IllegalArgumentException(
        s"Sampling weight column '$weightCol' must be an integral, " +
          s"long-ranged scale-0 decimal, or integral-valued float/double " +
          s"type, got $dt — fractional weights would truncate per-row " +
          "before the sum; pre-round them to an integer unit (chars, " +
          "tokens, bytes) upstream")
    }
  }

  /** Bernoulli sample at `rate` — a map-side filter, no shuffle. */
  def bernoulli(df: DataFrame, idCol: String, rate: Double,
      seed: Long = 0L): DataFrame =
    df.where(uniform(idAsLong(df, idCol), seed) < rate)

  /** Bounded smallest-k accumulator over (hash, id) pairs — kept sorted so
    * the common full-buffer reject is O(1); merged associatively, so Spark
    * runs it as a partial aggregation (same pattern as `Similarity.TopK`).
    */
  private class SmallestK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] = s.sorted.take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
      if (b.size >= k && implicitly[Ordering[(Double, Long)]].gt(a, b.last)) return b
      val idx = b.indexWhere(x => implicitly[Ordering[(Double, Long)]].gt(x, a))
      val ins = if (idx < 0) b :+ a else (b.take(idx) :+ a) ++ b.drop(idx)
      if (ins.size > k) ins.take(k) else ins
    }
    override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(b1 ++ b2)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** Deterministic stratified sample: the `quota` rows with the smallest
    * hash in each stratum; ids in the selection key make ties impossible,
    * so the pick is exact and stable. Implemented as a bounded-heap PARTIAL
    * aggregation — each task keeps at most `quota` (hash, id) pairs per
    * stratum and only those tiny buffers shuffle — then a broadcast
    * semi-join recovers the full rows. A per-stratum window would funnel a
    * hot stratum (half a 100 TB corpus can be one language) through a
    * single task's sort; this never moves more than
    * quota × strata × partitions pairs.
    *
    * @param broadcastPicked the picked-id set is quota × |strata| rows —
    *   broadcast by default; pass false for huge quotas and the semi-join
    *   shuffles instead (house escape hatch, as `Cdc.foldChanges`).
    */
  def quotaPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      quota: Int, seed: Long = 0L, broadcastPicked: Boolean = true): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    val spark = df.sparkSession
    import spark.implicits._
    val smallestK = new SmallestK(quota).toColumn
    val idL = idAsLong(df, idCol)
    val picked = df
      .select(col(stratumCol).cast("string").alias("_s"),
        uniform(idL, seed).alias("_u"), idL.alias("_id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(smallestK.name("_picked"))
      .flatMap { case (s, items) => items.map { case (_, id) => (s, id) } }
      .toDF("_s", "_id")
    val pickedSide = if (broadcastPicked) broadcast(picked) else picked
    // null-SAFE stratum equality: a NULL stratum is a legitimate stratum
    // (mix() samples it at defaultRate) — a plain === would null-kill the
    // join and silently zero that stratum's quota. String ids join on
    // their 48-bit hash: a collision would over-admit one extra row
    // (P ≈ n²/2^49 per stratum) — acceptable for sampling, never lossy.
    df.join(pickedSide,
      col(stratumCol).cast("string") <=> col("_s") && idL === col("_id"),
      "left_semi")
  }

  /** Per-stratum keep rates that hit an absolute WEIGHT budget (tokens,
    * chars, bytes — whatever `weightCol` carries): rate_s = min(1,
    * budget_s / total_s), with the totals measured by one aggregate over
    * the budgeted strata (the collect is |budgeted strata| rows — driver-
    * bounded). Practitioners budget corpora by TOKENS, not documents;
    * Bernoulli at these rates lands the budget in EXPECTATION (relative
    * s.d. ~ 1/√docs — negligible at corpus scale). The exact-cutoff
    * variant (admit smallest-hash docs until the running weight crosses
    * the budget) needs a per-stratum prefix sum — the hot-stratum funnel
    * this module rejects by design. A budgeted stratum absent from the
    * data (or with zero weight) rates 1.0: nothing to downsample.
    */
  def ratesForBudget(df: DataFrame, stratumCol: String, weightCol: String,
      budgets: Map[String, Long]): Map[String, Double] = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      "budgets must be non-empty and non-negative")
    val totals = df
      .where(col(stratumCol).cast("string").isin(budgets.keys.toSeq: _*))
      .groupBy(col(stratumCol).cast("string").alias("_s"))
      .agg(sum(weightAsLong(df, weightCol)).alias("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    budgets.map { case (s, b) =>
      s -> totals.get(s).filter(_ > 0)
        .map(t => math.min(1.0, b.toDouble / t.toDouble)).getOrElse(1.0)
    }
  }

  /** [[mix]] at [[ratesForBudget]]'s rates: token/char-budgeted corpus
    * mixing in one measurement pass + one map-side filter scan.
    */
  def mixByBudget(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, budgets: Map[String, Long], defaultRate: Double,
      seed: Long = 0L): DataFrame =
    mix(df, idCol, stratumCol, ratesForBudget(df, stratumCol, weightCol, budgets),
      defaultRate, seed)

  /** Temperature-based mixing rates — the multilingual-upsampling recipe
    * (XLM-R, Conneau et al. 2020 §3.1; mT5, Xue et al. 2021 §3.2): a
    * stratum holding share `p_s = t_s / N` of the corpus weight is
    * sampled with probability ∝ `p_s^alpha`, which per-ROW Bernoulli
    * realizes as keep rate `r_s ∝ p_s^(alpha−1)` — alpha = 1 keeps every
    * stratum untouched, alpha → 0 equalizes strata (rare languages
    * upsampled relative to the head). Subsampling cannot exceed 1, so
    * rates normalize to the LARGEST raw rate (for alpha < 1 that is the
    * smallest stratum): `r_s = maxRate · p_s^(alpha−1) / max_t
    * p_t^(alpha−1)` — the rarest stratum keeps `maxRate`, the head
    * downsamples toward it.
    *
    * Returned in integer MICRO-UNITS `floor(1e6 · r_s)` (the DSIR
    * quantization pattern): the one transcendental (`pow`, within-1-ulp
    * across engines) is floored into an integer per STRATUM — a handful
    * of values whose boundary margins a spec can scan — and the
    * downstream keep test `uniform(id) < r/1e6` is then one identical
    * IEEE division + compare in any engine (`q_sample_temperature`
    * re-derives the rates in SQL from the same totals). Quantization
    * error ≤ 1e-6 of a rate — far below sampling noise.
    *
    * One stratum-count-bounded aggregate; null strata are absent from
    * the map (dropped by [[mixByTemperature]], loudly documented there).
    */
  def ratesForTemperature(df: DataFrame, stratumCol: String,
      weightCol: String, alpha: Double, maxRate: Double = 1.0)
      : Map[String, Long] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(maxRate > 0 && maxRate <= 1,
      s"maxRate must be in (0, 1], got $maxRate")
    val totals = df
      .where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").alias("_s"))
      .agg(sum(weightAsLong(df, weightCol)).alias("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(totals.nonEmpty, "no non-null strata to mix")
    require(totals.values.forall(_ > 0),
      s"non-positive stratum weight in $totals")
    val n = totals.values.sum.toDouble
    // p as ONE division, pow, then 1e6·maxRate·(raw/mx) — the ratio
    // FIRST, so the normalizing stratum computes x/x = 1.0 exactly and
    // lands on precisely maxRate·1e6 (the (1e6·raw)/mx order rounds
    // 1e6·raw before dividing and can come out one micro-unit short);
    // the oracle replays the identical association order
    val raw = totals.map { case (s, t) =>
      s -> math.pow(t.toDouble / n, alpha - 1)
    }
    val mx = raw.values.max
    raw.map { case (s, r) =>
      s -> math.floor(1e6 * maxRate * (r / mx)).toLong
    }
  }

  /** [[mix]] at [[ratesForTemperature]]'s rates: one measurement
    * aggregate + one map-side filter scan. Rows with a NULL stratum are
    * DROPPED (they belong to no stratum and a silent default would skew
    * the temperature law — assign a stratum upstream).
    */
  def mixByTemperature(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, alpha: Double, maxRate: Double = 1.0,
      seed: Long = 0L): DataFrame = {
    val micro = ratesForTemperature(df, stratumCol, weightCol, alpha, maxRate)
    val rate = micro.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (k, v)) =>
        when(col(stratumCol).cast("string") === k,
          lit(v).cast("double") / lit(1e6)).otherwise(acc)
    }
    df.where(uniform(idAsLong(df, idCol), seed) < rate)
  }

  /** Weighted corpus mixing: per-stratum keep rates (downsample web,
    * keep books, …). Strata absent from `rates` use `defaultRate`.
    * Map-side only — the rate lookup folds into one CASE expression, so
    * mixing a 100 TB corpus is a single scan with the filter pushed to
    * the source.
    */
  def mix(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double,
      seed: Long = 0L): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be within [0, 1]")
    // stratum compared AS STRING, matching quotaPerStratum: rates are
    // string-keyed, and `intCol === "en"` null-evaluates, silently sending
    // every stratum of a non-string column to defaultRate (ADVICE r7)
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) =>
        when(col(stratumCol).cast("string") === k, lit(v)).otherwise(acc)
    }
    df.where(uniform(idAsLong(df, idCol), seed) < rate)
  }
}
