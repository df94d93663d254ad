package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for train/validation/test: each row's
  * split is a pure function of (id, seed) — stable across runs, cluster
  * sizes, partitionings, and re-reads, unlike `randomSplit`, whose
  * assignment shifts whenever partitioning does. Map-side only (a hash
  * and a comparison chain per row). Assignment depends on the NORMALIZED
  * cumulative weights: changing the seed OR the weight vector (including
  * appending a split, which shifts every normalized boundary) re-deals
  * rows across splits — to carve a new split without touching train,
  * subdivide an existing split's fraction explicitly (e.g. (8,1,1) →
  * (8, 1, 0.5, 0.5)) so the earlier boundaries stay fixed.
  */
object Splits {

  /** Assign each row to one named split with the given weights.
    *
    * @param weights ordered (name, weight) pairs; weights are normalized,
    *                so (8,1,1) and (0.8,0.1,0.1) are equivalent
    * @param seed    deal seed; a different seed is a fresh independent deal
    * @return df + `split` column (one of the names, never null)
    */
  def assign(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], seed: Long = 42L): DataFrame =
    // Shares Sampling's id dispatch: string ids hash, lossy id types
    // raise (never a silently-NULL deal).
    df.withColumn("split",
      assignExpr(Sampling.idAsLong(df, idCol), weights, seed))

  /** The split name as a pure COLUMN EXPRESSION of an already-integral id
    * — the map-side kernel behind [[assign]], exposed so audits over pair
    * frames (two id columns per row, e.g. near-dup pairs) derive both
    * sides' splits in place instead of joining the corpus back in twice.
    *
    * u ∈ [0, 1) comes from the shared Sampling hash: pure int64
    * arithmetic, so an external engine (the DuckDB oracle) reproduces the
    * exact deal — the r7 xxhash64 draw was equally deterministic but
    * SQL-opaque, which left the split gate rows-only. Use a seed distinct
    * from any concurrent Sampling step: the same (id, seed) pair yields
    * the same u, which would correlate the sample with the split
    * boundaries.
    */
  def assignExpr(id: Column, weights: Seq[(String, Double)],
      seed: Long = 42L): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be non-empty and positive")
    val u = Sampling.uniform(id, seed)
    weights.init.zip(cumulativeBounds(weights)).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, ((name, _), hi)) =>
        when(u < hi, lit(name)).otherwise(acc)
      }
  }

  /** Normalized cumulative upper bounds for all but the last split —
    * exposed so an oracle can interpolate the EXACT doubles the plan
    * compares against (0.8 + 0.1 is 0.9000000000000001 in IEEE; writing
    * "0.9" in SQL would disagree on a hash landing in the gap).
    */
  private[graft] def cumulativeBounds(weights: Seq[(String, Double)]): Seq[Double] = {
    val total = weights.map(_._2).sum
    weights.map(_._2 / total).scanLeft(0.0)(_ + _).tail
  }
}
