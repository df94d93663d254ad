package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

    // optional arg restricts the run: "corpus" = the corpus-growth probes,
    // "merges" = the 64-merge incremental-maintenance probe, "serve" =
    // literal-fold vs compiled-automaton tokenization; default all
    val what = if (args.isEmpty) Set("corpus", "merges", "serve") else args.toSet

    if (what("corpus")) {
      probe(100000L, "warmup") // JIT/codegen warmup
      probe(100000L, "n100k")
      probe(1000000L, "n1m")
      probe(4000000L, "n4m")
    }

    // Incremental pair-count maintenance at depth (VERDICT r12 #4): 64
    // merges over a LARGE distinct-word vocabulary (50k words, 6-14 chars
    // over an 8-letter alphabet — pairs specialize as merges accumulate).
    // With the r13 incremental maintenance, per-merge cost tracks the
    // AFFECTED-word subset: merges 9-64 must average at or below merges
    // 1-8 (early merges hit the most frequent pairs = the largest
    // affected sets) even though the vocab table never shrinks. Under the
    // pre-r13 full re-aggregation both averages would be the same
    // O(vocab) constant.
    if (what("merges")) {
      val bigVocabCounts = spark.range(50000)
        .select(
          array_join(
            transform(sequence(lit(1), (pmod(hash(col("id")), lit(9)) + lit(6)).cast("int")),
              i => element_at(array(('a' to 'h').map(ch => lit(ch.toString)): _*),
                pmod(hash(col("id") * lit(1000003) + i), lit(8)).cast("int") + 1)),
            "").alias("word"),
          (pmod(hash(col("id") * 31), lit(1000)) + lit(1)).cast("long").alias("cnt"))
        .groupBy("word").agg(sum("cnt").alias("cnt"))
        .localCheckpoint(true)
      println(s"distinct_words=${bigVocabCounts.count()}")
      // warmup the merge path once
      BpeTrain.trainFromCounts(bigVocabCounts, numMerges = 2).count()
      val t8 = time { BpeTrain.trainFromCounts(bigVocabCounts, numMerges = 8).count() }
      println(f"train8_50kvocab=$t8%.3f permerge_1to8=${t8 / 8}%.3f")
      val t64 = time { BpeTrain.trainFromCounts(bigVocabCounts, numMerges = 64).count() }
      println(f"train64_50kvocab=$t64%.3f permerge_9to64=${(t64 - t8) / 56}%.3f")
    }

    // Serving-path crossover (r13): per-document token counts under a
    // learned table, literal k-layer fold vs the compiled rank-priority
    // automaton, at k=8 and k=64 over a 50k-distinct-word / 500k-doc
    // corpus. The fold's per-distinct-word cost grows with k (k
    // interpreted expression layers); the automaton's is rank-count-
    // independent (HashMap probes per adjacent pair) — the numbers locate
    // the crossover the BpeTrain.tokens Scaladoc promises at vocabulary
    // scale.
    if (what("serve")) {
      val wordOf = (idx0: Column) => {
        val idx = idx0.cast("long") // int*1000003 overflows under ANSI
        array_join(
          transform(sequence(lit(1), (pmod(hash(idx), lit(9)) + lit(6)).cast("int")),
            i => element_at(array(('a' to 'h').map(ch => lit(ch.toString)): _*),
              pmod(hash(idx * lit(1000003L) + i), lit(8)).cast("int") + 1)),
          "")
      }
      val docs = spark.range(500000).select(col("id"),
        array_join(transform(sequence(lit(1), lit(20)),
          i => wordOf(pmod(hash(col("id") * lit(131) + i), lit(50000)))), " ")
          .alias("text")).localCheckpoint(true)
      val merges = BpeTrain.train(docs, "text", numMerges = 64)
        .orderBy("rank").collect()
        .map(m => (m.getString(1), m.getString(2))).toSeq
      def bench(label: String, f: Seq[(String, String)] => Unit): Unit =
        for (k <- Seq(8, 64)) {
          val t = time(f(merges.take(k)))
          println(f"${label}_k$k=$t%.3f")
        }
      bench("serve_fold",
        m => BpeTrain.tokenCounts(docs, "id", "text", m).count())
      bench("serve_compiled",
        m => BpeTrain.tokenCountsCompiled(docs, "id", "text", m).count())

      // the vocab-side fold ISOLATED (the end-to-end entries above are
      // dominated by the occurrence-side explode+join, which both paths
      // share): tokenize the 50k distinct words alone, k up to 256 —
      // the fold pays k interpreted layers per word AND k nested
      // aggregate() layers of analyzer/optimizer work per QUERY, the
      // automaton neither
      val words = docs
        .select(explode(filter(split(col("text"), "\\s+"),
          w => length(w) > 0)).alias("word"))
      val merges256 = BpeTrain.train(docs, "text", numMerges = 256)
        .orderBy("rank").collect()
        .map(m => (m.getString(1), m.getString(2))).toSeq
      for (k <- Seq(8, 64, 256)) {
        val m = merges256.take(k)
        // an analyzer blow-up (stack depth on the k-nested aggregate tree)
        // is itself a result at depth — record it instead of dying
        try {
          val tf = time {
            words.select(col("word").alias("text")).distinct()
              .select(sum(BpeTrain.tokenCount(col("text"), m)).alias("n"))
              .collect()
          }
          println(f"vocabfold_k$k=$tf%.3f")
        } catch {
          case e: Throwable =>
            // record the root cause, not just the wrapper class — the
            // k=256 failure mode is itself a result (SCALING §24)
            val root = Iterator.iterate(e)(_.getCause)
              .takeWhile(_ != null).reduceLeft((_, c) => c)
            println(s"vocabfold_k$k=FAILED(${e.getClass.getSimpleName}: " +
              s"${root.getClass.getSimpleName}: " +
              s"${Option(root.getMessage).getOrElse("").take(160)})")
        }
        val tc = time {
          BpeTrain.vocabTokensCompiled(words, m)
            .select(sum(size(col("toks"))).alias("n")).collect()
        }
        println(f"vocabcompiled_k$k=$tc%.3f")
      }
    }

    spark.stop()
  }
}
