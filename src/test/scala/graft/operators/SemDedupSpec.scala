package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[Dedup.semanticNearDups]] — SemDeDup-style cluster-pruned
  * semantic dedup (Abbas et al. 2023). The planted corpus has 10 tight
  * near-dup pairs (cosine ≥ 0.99) scattered among 80 random vectors, so
  * the recall floor measures what the operator exists for: duplicates sit
  * in tight clusters, and same-cell verification finds them.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private lazy val vectors = {
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val pairs = (0 until 10).flatMap { i =>
      val base = unit()
      val jig = base.map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, jig))
    }
    val noise = (0 until 80).map(i => ((20 + i).toLong, unit()))
    (pairs ++ noise).toDF("vec_id", "embedding")
  }

  private lazy val exact =
    Dedup.embeddingExactPairs(vectors, "vec_id", "embedding", threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("numCells = 1 degenerates to the exact all-pairs baseline") {
    val got = Dedup.semanticNearDups(vectors, "vec_id", "embedding",
        threshold = 0.98, numCells = 1, fitSampleSize = 200)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == exact)
  }

  test("cluster pruning keeps high recall on planted tight pairs") {
    assert(exact.size >= 10, s"corpus should plant >= 10 tight pairs, got ${exact.size}")
    val got = Dedup.semanticNearDups(vectors, "vec_id", "embedding",
        threshold = 0.98, numCells = 4, fitSampleSize = 200)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // cross-cell pairs are the (documented) recall trade; tight pairs
    // should essentially never split cells
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${got.size} of ${exact.size})")
    // pruning never invents pairs: everything found is exact-verified
    assert(got.subsetOf(exact))
  }

  test("deterministic and partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.semanticNearDups(df, "vec_id", "embedding",
        threshold = 0.98, numCells = 4, fitSampleSize = 200).collect().toSet
    assert(run(vectors) == run(vectors.repartition(7)))
  }

  test("keep-one composition: kept + losers partition the corpus") {
    val pairs = Dedup.semanticNearDups(vectors, "vec_id", "embedding",
      threshold = 0.98, numCells = 4, fitSampleSize = 200)
    val comps = Dedup.connectedComponents(pairs)
    val losers = comps.where(col("id") =!= col("component"))
    val kept = vectors.join(losers.select(col("id").alias("vec_id")),
      Seq("vec_id"), "left_anti")
    assert(kept.count() + losers.count() == vectors.count())
    // every component's minimal member survives
    assert(losers.count() > 0)
  }

  test("maxCell skips oversized cells instead of collecting them") {
    val got = Dedup.semanticNearDups(vectors, "vec_id", "embedding",
        threshold = 0.98, numCells = 1, fitSampleSize = 200, maxCell = 10)
      .count()
    assert(got == 0) // the single 100-vector cell exceeds the cap
  }
}
