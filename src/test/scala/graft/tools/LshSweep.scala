package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** (tables × planes) sweep for the embedding-LSH near-dup path: time and
  * recall vs the exact all-pairs baseline at sf0.1
  * (Test/runMain graft.tools.LshSweep). Picks the parameterization for
  * `q_fused_dedup_pairs` (VERDICT r6 #5).
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "sf0.1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.4
    val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
    emb.count()
    val exact = Dedup.embeddingExactPairs(emb, "vec_id", "embedding", threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"exact pairs: ${exact.size} (threshold $threshold)")
    for ((tables, planes) <- Seq((64, 4), (56, 4), (48, 4), (40, 4), (32, 4),
        (48, 5), (32, 5), (24, 6), (16, 6), (8, 8))) {
      // run twice, report the second (steady-state)
      var got: Set[(Long, Long)] = Set.empty
      var secs = 0.0
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        got = Dedup.embeddingNearDups(emb, "vec_id", "embedding", dim = 64,
          threshold = threshold, numPlanes = planes, tables = tables)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        secs = (System.nanoTime() - t0) / 1e9
      }
      val recall = if (exact.isEmpty) 1.0
        else got.intersect(exact).size.toDouble / exact.size
      println(f"tables=$tables%3d planes=$planes: $secs%.2f s  recall=$recall%.4f  pairs=${got.size}")
    }
    spark.stop()
  }
}
