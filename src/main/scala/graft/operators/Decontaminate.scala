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

  /** [[overlap]] for eval sets too big to broadcast as an exact hash set:
    * the benchmark grams compress into a bloom filter (~`bitsPerGram` bits
    * per gram vs 64+ for the exact set — a 10^9-gram eval side becomes a
    * ~2 GB set but only a ~120 MB bloom), which prefilters the corpus
    * explode MAP-SIDE; the survivors (true matches + ~0.05% false
    * positives at 16 bits/gram) then verify through an exact join, so the
    * OUTPUT IS IDENTICAL to [[overlap]] — the bloom changes where bytes
    * move, never the answer. The bloom is built distributively
    * (per-partition partials, OR-merge — associative, so `treeAggregate`
    * is safe) and the verify join deliberately does NOT broadcast: it
    * shuffles only the post-bloom candidate set, which is tiny by
    * construction.
    */
  def overlapBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 13, minShared: Long = 1L,
      bitsPerGram: Int = 16): DataFrame = {
    import graft.functions.SketchOps
    val spark = corpus.sparkSession
    import spark.implicits._
    val benchGrams = bench
      .select(explode(word_ngram_hashes(col(textCol), n)).alias("_g"))
      .distinct()
    // cache ONLY for the two driver-side passes (size + bloom build), and
    // release before returning: the verify join below is lazy, so a cache
    // it referenced could never be safely unpersisted and would leak one
    // cached dataset per call (review r8). The join recomputes the gram
    // set once — it is the small eval side by contract.
    benchGrams.cache()
    val (numBits, k, words) =
      try {
        val nGrams = benchGrams.count()
        val bits = SketchOps.bloomNumBits(math.max(1L, nGrams), bitsPerGram)
        val kk = SketchOps.bloomK(bitsPerGram)
        val w = benchGrams.as[Long].rdd.treeAggregate(
          new Array[Long](bits / 64))(
          (acc, h) => SketchOps.bloomAdd(acc, bits, kk, Iterator.single(h)),
          (a, b) => SketchOps.bloomOr(a, b))
        (bits, kk, w)
      } finally benchGrams.unpersist()
    corpus
      .select(col(idCol), explode(word_ngram_hashes(col(textCol), n)).alias("_g"))
      .where(graft.functions.GraftExpressions
        .bloom_might_contain(col("_g"), words, k))
      .join(benchGrams, "_g") // exact verify over the surviving sliver
      .groupBy(col(idCol))
      .agg(count(lit(1)).alias("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
