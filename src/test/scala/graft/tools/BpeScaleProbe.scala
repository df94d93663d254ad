package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** Scale probe for the BPE trainer's central claim: after the ONE
  * corpus-sized word-count shuffle, training cost is bound by the
  * DISTINCT-WORD table, not the corpus — so a fixed vocabulary under
  * 100k / 1M / 4M documents must show `wordCounts` growing ~linearly
  * while `trainFromCounts` (4 merges over the materialized counts)
  * stays flat.
  *
  * Run: `sbt "Test/runMain graft.tools.BpeScaleProbe"`. Prints one
  * `name=seconds` line per measurement; numbers land in SCALING.md §21.
  */
object BpeScaleProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixed 60-word vocabulary (4-8 chars over a-e); docs of 20 words,
    // id-hash sampled — corpus grows, distinct words don't
    val vocabWords = (0 until 60).map { i =>
      val len = 4 + i % 5
      (0 until len).map(j => ('a' + (i * 7 + j * 3) % 5).toChar).mkString
    }
    val vocabLit = array(vocabWords.map(lit): _*)
    def corpus(n: Long): DataFrame =
      spark.range(n).select(col("id"),
        array_join(transform(sequence(lit(1), lit(20)),
          i => element_at(vocabLit,
            (pmod(hash(col("id") * i), lit(60)) + 1).cast("int"))), " ")
          .alias("text"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def probe(n: Long, label: String): Unit = {
      val docs = corpus(n)
      var counts: DataFrame = null
      val wc = time {
        counts = BpeTrain.wordCounts(docs, "text").localCheckpoint(true)
      }
      println(f"wordcounts_$label=$wc%.3f")
      val tr = time { BpeTrain.trainFromCounts(counts, numMerges = 4).count() }
      println(f"train4_$label=$tr%.3f")
    }

    probe(100000L, "warmup") // JIT/codegen warmup
    probe(100000L, "n100k")
    probe(1000000L, "n1m")
    probe(4000000L, "n4m")

    spark.stop()
  }
}
