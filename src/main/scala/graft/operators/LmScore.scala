package graft.operators

import graft.functions.GraftExpressions.word_ngram_hash_seq
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-statistics language-model scoring — the CCNet-style idea
  * ("CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", Wenzek et al. 2020: score each document by an n-gram LM and
  * filter on perplexity) with the corpus ITSELF as the model. A document
  * whose word n-grams are common across the corpus reads like the corpus;
  * one full of hapax n-grams is an outlier (boilerplate soup, garbled
  * encoding, another language). CCNet trains KenLM on a reference corpus;
  * the self-trained variant needs no model artifact and the "train" is one
  * aggregation over the same table being scored.
  *
  * All outputs are EXACT integers (and one division of them): sums of
  * per-gram corpus counts, not floating log-likelihoods — so the result is
  * order-independent, cluster ≡ local bit-for-bit, and a SQL engine
  * computing the same counts reproduces it (`q_text_lm_score`).
  * `log2_sum` (Σ ⌊log2 count⌋, an integer log-likelihood proxy) stands in
  * for Σ log p(gram): the two rank documents near-identically and the
  * integer version survives hash-comparison.
  */
object LmScore {

  /** Per-document n-gram count features against the corpus-wide n-gram
    * count table.
    *
    * Output: (idCol, n_grams, cnt_sum, log2_sum, n_rare, avg_log2) —
    * gram occurrences in the doc; Σ corpus-count over them; Σ ⌊log2
    * corpus-count⌋ (the LM-score proxy — higher = more predictable text);
    * how many occurrences are "rare" (corpus count ≤ `rareThreshold`,
    * default = hapax: this doc is the only place the gram appears); and
    * log2_sum/n_grams (the per-gram average, the perplexity analogue).
    * Documents with fewer than `n` tokens score all-zero rather than
    * dropping out.
    *
    * Scale shape: the explode is O(total tokens) rows of 8-byte gram
    * hashes (never gram strings); the count table is one
    * partial-aggregating groupBy on that key; the scoring join shuffles
    * both sides on the same 8-byte key (a boilerplate gram repeated 10^9
    * times is a hot join key, not a collected list); the final per-doc
    * fold is a groupBy on the doc id with integer sums — three shuffles,
    * all map-side combined, nothing quadratic, no driver participation.
    * At 100 TB the count table itself is big (≈ distinct n-grams); if it
    * must shrink, prune to counts ≥ 2 and treat absent grams as count 1
    * (exactly the hapax semantics) — that variant broadcasts for most
    * corpora, at the price of `cnt_sum` no longer being exact for hapax
    * runs.
    */
  def ngramCountFeatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, rareThreshold: Long = 1L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(rareThreshold >= 1, s"rareThreshold must be >= 1, got $rareThreshold")
    val grams = Dedup.widen(df).select(col(idCol),
      explode(word_ngram_hash_seq(col(textCol), n)).alias("_g"))
    val counts = grams.groupBy(col("_g")).agg(count(lit(1)).alias("_c"))
    val scored = grams.join(counts, Seq("_g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).alias("n_grams"),
        sum(col("_c")).alias("cnt_sum"),
        sum(floor(log2(col("_c"))).cast(LongType)).alias("log2_sum"),
        sum(when(col("_c") <= rareThreshold, 1L).otherwise(0L)).alias("n_rare"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).alias("n_grams"),
        coalesce(col("cnt_sum"), lit(0L)).alias("cnt_sum"),
        coalesce(col("log2_sum"), lit(0L)).alias("log2_sum"),
        coalesce(col("n_rare"), lit(0L)).alias("n_rare"))
      .withColumn("avg_log2",
        when(col("n_grams") > 0,
          col("log2_sum").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
  }
}
