package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for large joins: salting. A hot key that would pin one
  * reducer is spread over `saltFactor` partitions by extending the join key
  * with a deterministic salt on the big side and replicating the small side
  * across every salt value.
  *
  * Use when AQE's skew-join split can't help (e.g. a shuffled hash join
  * where one build key dominates). The salt is derived from the big side's
  * whole row (xxhash64), so it is deterministic — reruns produce identical
  * partitioning.
  */
object Skew {

  /** Join types for which replicating the small side is correct: every
    * small-side row appears once per salt value, so any join that can emit
    * an UNMATCHED small-side row ("right"/"full_outer") would duplicate it
    * saltFactor times.
    */
  private val BigSidePreserving =
    Set("inner", "cross", "left", "leftouter", "left_outer",
      "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")

  /** Equi-join `big ⋈ small` on `keys`, salted `saltFactor` ways.
    * `small` grows ×saltFactor (it must be the replicable side); the big
    * side is scanned once with a map-side salt column. Only big-side-
    * preserving join types are accepted (see [[BigSidePreserving]]).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, "saltFactor > 1")
    require(BigSidePreserving.contains(joinType.toLowerCase),
      s"saltedJoin: joinType '$joinType' would emit unmatched small-side rows " +
        s"once per salt replica; use one of $BigSidePreserving")
    val salt = "_salt"
    val bigSalted = big.withColumn(salt,
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val smallSalted = small.withColumn(salt,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallSalted, keys :+ salt, joinType).drop(salt)
  }

  /** Top-N heaviest keys of a frame — the skew diagnostic that decides
    * whether salting is worth it (run on a sample at scale).
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).alias("n"))
      .orderBy(col("n").desc)
      .limit(topN)
}
