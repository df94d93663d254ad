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

  /** Reproducible per-row uniform in [0,1): two residues of the id (mod
    * two ~2^31 primes), each spread by a multiplicative constant and
    * folded mod 2^32 — identical in any engine (every intermediate fits
    * int64: (2^31)·K < 2^63, so no overflow and no float ambiguity, which
    * is what DuckDB-oracle reproducibility requires). Combining TWO
    * residues matters: one `(id % p) * K` hash repeats with period p, so a
    * corpus beyond p ids would sample in arithmetic progressions; the pair
    * has period p1·p2 ≈ 4.6e18 — the full practical id space. The seed
    * enters BEFORE the multiplies: added after, it would only rotate every
    * hash by seed/2^32 and "reseeding" would barely move the sample.
    * Ample mixing for rate/quota sampling; NOT a cryptographic source.
    */
  def uniform(idCol: Column, seed: Long): Column =
    pmod(
      pmod(pmod(idCol + lit(seed), lit(P1)) * lit(Knuth), lit(Bucket)) +
        pmod(pmod(idCol + lit(seed), lit(P2)) * lit(Knuth2), lit(Bucket)),
      lit(Bucket)).cast("double") / lit(Bucket.toDouble)

  /** Bernoulli sample at `rate` — a map-side filter, no shuffle. */
  def bernoulli(df: DataFrame, idCol: String, rate: Double,
      seed: Long = 0L): DataFrame =
    df.where(uniform(col(idCol), seed) < rate)

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
    val picked = df
      .select(col(stratumCol).cast("string").alias("_s"),
        uniform(col(idCol), seed).alias("_u"), col(idCol).cast("long").alias("_id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(smallestK.name("_picked"))
      .flatMap { case (s, items) => items.map { case (_, id) => (s, id) } }
      .toDF("_s", "_id")
    val pickedSide = if (broadcastPicked) broadcast(picked) else picked
    // null-SAFE stratum equality: a NULL stratum is a legitimate stratum
    // (mix() samples it at defaultRate) — a plain === would null-kill the
    // join and silently zero that stratum's quota
    df.join(pickedSide,
      col(stratumCol).cast("string") <=> col("_s") &&
        col(idCol).cast("long") === col("_id"), "left_semi")
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
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(uniform(col(idCol), seed) < rate)
  }
}
