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
      weights: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be non-empty and positive")
    val total = weights.map(_._2).sum
    // u ∈ [0, 1): 20 uniform hash bits — plenty below any realistic
    // split-fraction resolution
    val u = pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 20))
      .cast("double") / (1L << 20).toDouble
    val bounds = weights.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val expr0: Column = weights.init.zip(bounds).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, ((name, _), hi)) =>
        when(u < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr0)
  }
}
