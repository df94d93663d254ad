package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity}

/** Filtered-ANN recall measurement (VERDICT r12 #8): SCALING §22 states
  * the selectivity-vs-nprobe trade qualitatively — "a selective filter
  * shrinks each probed cell's pool, so keeping k filled needs more
  * probes" — this probe turns it into numbers a caller can budget
  * against: recall@10 over selectivity {0.5, 0.1, 0.01} × nprobe
  * {1, 2, 4, 8, 16} on (a) the real sf0.1 embeddings corpus and (b) a
  * 200k synthetic corpus so the table isn't an artifact of the small
  * real table's 125-rows-per-cell geometry.
  *
  * Recall@10 = |approx ∩ exact| / (k × queries), exact = brute-force
  * top-10 over the QUALIFYING corpus (the same definition the
  * q_ann_filtered_search oracle uses). The filter (vec_id % s == 0) is
  * independent of embedding geometry, so qualifying rows are uniform
  * across cells — the worst honest case for a partial-probe search
  * (a correlated filter concentrates qualifiers in few cells and
  * recovers recall at the same nprobe).
  *
  * Run: `sbt "Test/runMain graft.tools.AnnFilterRecallProbe"`; numbers
  * land in SCALING.md §23; the worst measured cell is pinned by
  * AnnIndexSpec's "filtered-search recall floor" test.
  */
object AnnFilterRecallProbe {

  private val K = 10
  private val NumCells = 16

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def probe(corpus: DataFrame, nQueries: Int, label: String): Unit = {
      val work = java.nio.file.Files.createTempDirectory(s"graft-annrp-$label")
      try {
        val ix = work.resolve("ix").toString
        AnnIndex.buildIvf(ix, corpus, "vec_id", "embedding",
          numCells = NumCells, seed = 1L, fitSampleSize = 2000)
        val queries = corpus.where(col("vec_id") < nQueries)
          .select(col("vec_id").alias("qid"), col("embedding"))
          .localCheckpoint(true)
        for (sel <- Seq(2, 10, 100)) {
          val pred = pmod(col("vec_id"), lit(sel)) === 0
          val truth = Similarity.bruteForceTopK(
              corpus.where(pred),
              queries.withColumnRenamed("qid", "vec_id"),
              "vec_id", "embedding", "vec_id", k = K)
            .select("query_id", "neighbor_id").localCheckpoint(true)
          val denom = truth.count().toDouble // < nQueries*K when the
          // qualifying corpus is smaller than k — recall is against the
          // achievable set, not a padded k
          for (nprobe <- Seq(1, 2, 4, 8, 16)) {
            // hatch off: this probe measures the PROBED path's recall —
            // the r14 brute-force hatch would turn the selective cells
            // into exact rows and erase the very table being measured
            val got = AnnIndex.searchIvf(ix, queries, "qid", k = K,
                nprobe = nprobe, where = Some(pred),
                bruteForcePoolPerCell = 0)
              .select("query_id", "neighbor_id")
            val hit = got.join(truth, Seq("query_id", "neighbor_id")).count()
            println(f"recall_${label}_sel1of${sel}_np$nprobe=${hit / denom}%.3f")
          }
        }
      } finally graft.util.Fs.rmTree(work.toFile)
    }

    /** Hatch cost vs probed cost (r14): wall seconds for the SAME
      * selective filtered search with the brute-force hatch on (count +
      * exact subset scan) vs off (probed path) — the measurement behind
      * the hatch Scaladoc's "cheaper than probing below the threshold"
      * claim. Median of 3 per configuration.
      */
    def hatchCost(corpus: DataFrame, nQueries: Int, sel: Int,
        label: String): Unit = {
      val work = java.nio.file.Files.createTempDirectory(s"graft-annhc-$label")
      try {
        val ix = work.resolve("ix").toString
        AnnIndex.buildIvf(ix, corpus, "vec_id", "embedding",
          numCells = NumCells, seed = 1L, fitSampleSize = 2000)
        val queries = corpus.where(col("vec_id") < nQueries)
          .select(col("vec_id").alias("qid"), col("embedding"))
          .localCheckpoint(true)
        // sel sized so ~100 qualifying rows over 16 cells (6.25/cell)
        // land below the 10/cell threshold at every corpus size
        val pred = pmod(col("vec_id"), lit(sel)) === 0
        def median3(pool: Double): Double =
          Seq.fill(3) {
            val t0 = System.nanoTime()
            AnnIndex.searchIvf(ix, queries, "qid", k = K, nprobe = 8,
                where = Some(pred), bruteForcePoolPerCell = pool)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.sorted.apply(1)
        println(f"hatchcost_${label}_on=${median3(10.0)}%.3f")
        println(f"hatchcost_${label}_off=${median3(0.0)}%.3f")
      } finally graft.util.Fs.rmTree(work.toFile)
    }

    val what = if (args.isEmpty) Set("recall", "hatch") else args.toSet

    // synthetic 200k corpus, same generator as AnnScaleProbe: 100x the
    // rows-per-cell density, so cell-pool shrinkage under the filter is
    // measured away from the small-table regime
    val dim = 16
    val synth = spark.range(200000).select(col("id").alias("vec_id"))
      .withColumn("embedding", expr(
        s"transform(sequence(1, $dim), " +
          "i -> cast(pmod(hash(vec_id * i), 1000) / 1000.0 as float))"))

    if (what("recall")) {
      probe(spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding"), nQueries = 64, label = "sf01")
      probe(synth, nQueries = 64, label = "n200k")
    }
    if (what("hatch")) {
      hatchCost(synth, nQueries = 64, sel = 2000, label = "n200k_d16")
      // production-shaped corpus: 1M rows x 64 dims — here the probed
      // path's vector-byte scan dominates and the hatch's column-pruned
      // count is the cheap side of the trade
      val wide = spark.range(1000000).select(col("id").alias("vec_id"))
        .withColumn("embedding", expr(
          "transform(sequence(1, 64), " +
            "i -> cast(pmod(hash(vec_id * i), 1000) / 1000.0 as float))"))
      hatchCost(wide, nQueries = 64, sel = 10000, label = "n1m_d64")
    }

    spark.stop()
  }
}
