package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BpeTrain, UnigramLm}

/** Scale probe for the unigram-LM trainer's central claim (the same split
  * [[BpeScaleProbe]] measures for BPE): after the ONE corpus-sized
  * word-count shuffle, seeding and every hard-EM iteration are bound by
  * the DISTINCT-WORD table — so a fixed vocabulary under 100k / 1M / 4M
  * documents must show `wordCounts` growing ~linearly while `seedVocab` +
  * `emStep` stay flat. The second axis is the honest scaling direction:
  * EM cost vs distinct-word count (1k / 10k / 50k words), expected
  * ~linear — the per-word Viterbi DP is O(|word| · maxPieceLen) against a
  * broadcast model, so the E-step is one narrow pass over the vocab table.
  *
  * Run: `sbt "Test/runMain graft.tools.UnigramScaleProbe"`. Prints one
  * `name=seconds` line per measurement; numbers land in SCALING.md §24.
  */
object UnigramScaleProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixed 60-word vocabulary (4-8 chars over a-e); docs of 20 words,
    // id-hash sampled — corpus grows, distinct words don't (the
    // BpeScaleProbe generator, same shape for comparability)
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

    def collectModel(df: DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    def probeCorpus(n: Long, label: String): Unit = {
      val docs = corpus(n)
      var counts: DataFrame = null
      val wc = time {
        counts = BpeTrain.wordCounts(docs, "text").localCheckpoint(true)
      }
      println(f"wordcounts_$label=$wc%.3f")
      var model: Seq[(String, Long)] = null
      val sv = time {
        model = collectModel(
          UnigramLm.seedVocab(counts, maxPieceLen = 4, seedSize = 500))
      }
      println(f"seed_$label=$sv%.3f")
      val em = time { UnigramLm.emStep(counts, model).count() }
      println(f"emstep_$label=$em%.3f")
      // soft E-step (r15): same distinct-word × broadcast-model shape,
      // forward-backward instead of Viterbi — must stay equally flat
      val ems = time { UnigramLm.emStepSoft(counts, model).count() }
      println(f"emstepsoft_$label=$ems%.3f")
      counts.unpersist()
    }

    // distinct-word growth at a fixed per-word shape: 6-14 chars over an
    // 8-letter alphabet (the BpeScaleProbe merges-vocab generator)
    def bigVocab(words: Int): DataFrame =
      spark.range(words).select(
        concat_ws("", transform(
          sequence(lit(1), (pmod(col("id"), lit(9)) + 6).cast("int")),
          j => element_at(array(('a' to 'h').map(c => lit(c.toString)): _*),
            (pmod(hash(col("id") * j), lit(8)) + 1).cast("int"))))
          .alias("word"),
        (pmod(col("id"), lit(997)) + 1).alias("cnt"))
        .groupBy("word").agg(sum(col("cnt")).alias("cnt"))

    def probeVocab(words: Int, label: String): Unit = {
      val counts = bigVocab(words).localCheckpoint(true)
      val model = collectModel(
        UnigramLm.seedVocab(counts, maxPieceLen = 4, seedSize = 2000))
      val em = time { UnigramLm.emStep(counts, model).count() }
      println(f"emstep_vocab_$label=$em%.3f")
      val ems = time { UnigramLm.emStepSoft(counts, model).count() }
      println(f"emstepsoft_vocab_$label=$ems%.3f")
      counts.unpersist()
    }

    val what = if (args.isEmpty) Set("corpus", "vocab") else args.toSet
    if (what("corpus")) {
      probeCorpus(100000L, "warmup")
      probeCorpus(100000L, "n100k")
      probeCorpus(1000000L, "n1m")
      probeCorpus(4000000L, "n4m")
    }
    if (what("vocab")) {
      probeVocab(1000, "warmup")
      probeVocab(1000, "w1k")
      probeVocab(10000, "w10k")
      probeVocab(50000, "w50k")
    }
    spark.stop()
  }
}
