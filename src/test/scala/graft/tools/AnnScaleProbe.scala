package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AnnIndex

/** Scale probe for the persisted ANN index's maintenance claims (the
  * VERDICT r10 #8 / SCALING §18 "measure, don't argue" treatment applied
  * to [[graft.operators.AnnIndex]]):
  *
  *   1. `appendIvf` is O(batch): a fixed 5k-vector append against a 50k /
  *      500k / 2M-vector index must stay ~flat — appends encode against
  *      the PERSISTED quantizer and publish a delta, never rewriting the
  *      corpus.
  *   2. `deleteIvf` is O(batch): a fixed 5k-id tombstone against the same
  *      three corpus sizes must stay ~flat — one tombstone delta, no
  *      index data touched.
  *   3. `compactIvf` is the one O(live corpus) operation — measured at
  *      each size so the append/delete flatness has its honest
  *      counterpoint: the fold cost exists, it is just paid once per
  *      policy window instead of per batch. (At probe sizes the fold is
  *      overhead-dominated — 2M × 16 floats is ~128 MB over 32 cores —
  *      so expect near-flat numbers here too; the claim the probe pins
  *      is the append/delete SHAPE, not compact's slope.)
  *
  * Deliberately NOT timed: search-with-pruning. At probe scale a timed
  * nprobe=1 vs nprobe=all comparison measures planning/broadcast overhead
  * (~2 s) rather than scan work; the only-probed-cells claim is pinned
  * the right way — as a files-read assertion — in AnnIndexSpec.
  *
  * Run: `sbt "Test/runMain graft.tools.AnnScaleProbe"`. Prints one
  * `name=seconds` line per measurement; numbers land in SCALING.md §21.
  */
object AnnScaleProbe {

  private val Dim = 16
  private val NumCells = 32

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic embeddings (id-hash derived, unit-free —
    // cosine only needs non-degenerate directions)
    def vecs(n: Long, idOffset: Long = 0L): DataFrame =
      spark.range(n).select((col("id") + idOffset).alias("id"))
        .withColumn("embedding", expr(
          s"transform(sequence(1, $Dim), " +
            "i -> cast(pmod(hash(id * i), 1000) / 1000.0 as float))"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def probe(n: Long, label: String): Unit = {
      val work = java.nio.file.Files.createTempDirectory(s"graft-annsp-$label")
      try {
        val ix = work.resolve("ix").toString
        val built = time {
          AnnIndex.buildIvf(ix, vecs(n), "id", "embedding",
            numCells = NumCells, fitSampleSize = 2000)
        }
        println(f"build_$label=$built%.3f")
        // fixed-size batch regardless of corpus size: the O(batch) claim
        val appended = time { AnnIndex.appendIvf(ix, vecs(5000, idOffset = n)) }
        println(f"append5k_$label=$appended%.3f")
        val deleted = time {
          AnnIndex.deleteIvf(ix,
            spark.range(5000).select((col("id") * 17 % n).alias("id")).distinct())
        }
        println(f"delete5k_$label=$deleted%.3f")
        val compacted = time { AnnIndex.compactIvf(ix) }
        println(f"compact_$label=$compacted%.3f")
      } finally graft.util.Fs.rmTree(work.toFile)
    }

    // optional arg restricts the run: "sizes" = the O(batch) probes,
    // "maintain" = the search-cost-vs-debt probes; default both
    val what = if (args.isEmpty) Set("sizes", "maintain") else args.toSet

    if (what("sizes")) {
      probe(50000L, "warmup") // JIT/codegen warmup
      probe(50000L, "n50k")
      probe(500000L, "n500k")
      probe(2000000L, "n2m")
    }

    // 4. Search cost vs maintenance debt (VERDICT r12 #3): the same
    //    24-batch append+delete CDC stream through AnnIndexMaintainer,
    //    once with NO policy (debt climbs to 2 dirs/batch = 48 un-folded
    //    dirs — every probed-cell scan unions 48 extra parquet reads and
    //    the tombstone anti-filter broadcast grows unboundedly) and once
    //    with the count policy at 8 (debt stays < 8 forever). Search
    //    (16 queries, k=10, nprobe=8) is timed median-of-3 every 6
    //    batches; the policy row must stay ~flat while the no-policy row
    //    climbs — the measured counterpart of AnnMaintainerSpec's
    //    boundedness assertion.
    def maintainProbe(policy: Option[Int], label: String): Unit = {
      import graft.cdc.Cdc
      val n = 200000L
      val work = java.nio.file.Files.createTempDirectory(s"graft-annmp-$label")
      try {
        val ix = work.resolve("ix").toString
        AnnIndex.buildIvf(ix, vecs(n), "id", "embedding",
          numCells = NumCells, fitSampleSize = 2000)
        val maint = new graft.streaming.AnnIndexMaintainer(ix,
          autoCompactDeltas = policy)
        val queries = vecs(16).select(col("id").alias("qid"), col("embedding"))
          .localCheckpoint(true)
        def searchMedian3(): Double = Seq.fill(3)(time {
          AnnIndex.searchIvf(ix, queries, "qid", k = 10, nprobe = 8)
            .write.format("noop").mode("overwrite").save()
        }).sorted.apply(1)
        (0 until 24).foreach { b =>
          val appends = vecs(5000, idOffset = n + 5000L * b)
            .withColumn(Cdc.ChangeType, lit(Cdc.Upsert))
          val deletes = spark.range(2000)
            .select(((col("id") * 97 + b * 2000) % n).alias("id")).distinct()
            .withColumn("embedding", lit(null).cast("array<float>"))
            .withColumn(Cdc.ChangeType, lit(Cdc.Delete))
          maint.processBatch(appends.unionByName(deletes), b.toLong)
          if ((b + 1) % 6 == 0) {
            val s = searchMedian3()
            println(f"search_${label}_b${b + 1}=$s%.3f " +
              f"debt_${label}_b${b + 1}=${AnnIndex.deltaDebt(ix)}")
          }
        }
      } finally graft.util.Fs.rmTree(work.toFile)
    }
    if (what("maintain")) {
      maintainProbe(None, "nopolicy")
      maintainProbe(Some(8), "policy")
    }

    spark.stop()
  }
}
