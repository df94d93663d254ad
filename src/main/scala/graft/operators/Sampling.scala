package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  private val Knuth = 2654435761L  // floor(2^32 / golden ratio), Knuth §6.4
  private val IdMod = 1000003L     // prime; keeps the int64 product overflow-free
  private val Bucket = 4294967296L // 2^32

  /** Reproducible per-row uniform in [0,1): `((id + seed) % p) * K % 2^32
    * / 2^32` — identical in any engine (no overflow, no float ambiguity).
    * The seed enters BEFORE the multiplicative mix: added after, it would
    * only rotate every hash by seed/2^32 and "reseeding" would barely move
    * the sample. Ample mixing for rate/quota sampling; NOT a cryptographic
    * source.
    */
  def uniform(idCol: Column, seed: Long): Column =
    pmod(pmod(idCol + lit(seed), lit(IdMod)) * lit(Knuth), lit(Bucket))
      .cast("double") / lit(Bucket.toDouble)

  /** Bernoulli sample at `rate` — a map-side filter, no shuffle. */
  def bernoulli(df: DataFrame, idCol: String, rate: Double,
      seed: Long = 0L): DataFrame =
    df.where(uniform(col(idCol), seed) < rate)

  /** Deterministic stratified sample: the `quota` rows with the smallest
    * hash in each stratum. One shuffle (window PARTITIONED by stratum —
    * never global); the id in the order key makes ties impossible, so the
    * selection is exact and stable. At 100 TB a hot stratum is one
    * partition's sort of that stratum only, not the corpus.
    */
  def quotaPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      quota: Int, seed: Long = 0L): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(uniform(col(idCol), seed), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= quota).drop("_rk")
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
