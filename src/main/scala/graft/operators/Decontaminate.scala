package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions._

/** Benchmark decontamination for training corpora: flag corpus documents
  * that share word n-grams with a held-out benchmark/eval set — the
  * standard n-gram-overlap contamination test (13-gram overlap in GPT-3's
  * appendix; the operator parameterizes n).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus (eval
  * sets are thousands of documents, the corpus is billions), so its
  * distinct gram set BROADCASTS and the corpus side stays a single
  * map-side explode + hash-join + partial-count aggregation — the 100 TB
  * corpus is read once, shuffled only for the final per-doc count.
  * Grams are 64-bit hashes (the codegen'd [[graft.functions
  * .GraftExpressions.word_ngram_hashes]] kernel), not strings: the
  * broadcast stays a long set and the explode never materializes text.
  */
object Decontaminate {

  /** Per-document contamination report: documents sharing at least
    * `minShared` distinct word n-grams with the benchmark set.
    *
    * @return (idCol, n_shared) — n_shared counts DISTINCT shared grams
    *         (the kernel emits each gram once per document)
    */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 13, minShared: Long = 1L,
      broadcastBench: Boolean = true): DataFrame = {
    val benchGrams0 = bench
      .select(explode(word_ngram_hashes(col(textCol), n)).alias("_g"))
      .distinct()
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    corpus
      .select(col(idCol), explode(word_ngram_hashes(col(textCol), n)).alias("_g"))
      .join(benchGrams, "_g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).alias("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
