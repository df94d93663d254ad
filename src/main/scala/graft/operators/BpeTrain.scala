package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING — the missing half of
  * the tokenizer story next to `TextAnalysis.wordpieceTokens` (which
  * tokenizes with a vocabulary someone else already learned). Classic
  * corpus-level BPE (Sennrich-style, as used by GPT-2/SentencePiece
  * trainers): learn `numMerges` merge rules by repeatedly fusing the
  * globally most frequent adjacent symbol pair.
  *
  * 100 TB design: the corpus is touched ONCE — a single shuffle folds it
  * to the (word, count) vocabulary table, which is what every real BPE
  * trainer iterates on (pair statistics are identical because words are
  * the merge boundaries). Each iteration is then one narrow aggregation
  * over that compact table (millions of distinct words at worst — executor
  * sized, never corpus sized) plus a driver-side collect of exactly ONE
  * row (the argmax pair — same bounded-collect class as KMeans' k×dim
  * centroids), and the merge itself is a map-side higher-order-function
  * fold, no shuffle. Ties break deterministically (count desc, then pair
  * lexicographically) so the learned table is reproducible cross-engine.
  *
  * Marker-free formulation: merges never cross word boundaries (the fold
  * runs per word), but no `</w>` end-of-word symbol is appended, so a
  * word-final and a word-internal occurrence of the same string are one
  * symbol — the GPT-2-style choice. Sennrich's `</w>` variant is a
  * preprocessing step (suffix each word's final character) over the same
  * machinery, not a different trainer.
  */
object BpeTrain {

  /** One corpus pass: whitespace words with occurrence counts. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).alias("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).alias("cnt"))

  /** A word as its initial symbol sequence (single characters). */
  private[operators] def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Greedy left-to-right non-overlapping fusion of adjacent (l, r) into
    * l+r — the standard BPE apply step, as one catalyst `aggregate` fold
    * (interpreted higher-order function, but map-side and shuffle-free).
    */
  private[operators] def fuse(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, lit(-1)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of a symbol list (empty below length 2). */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).alias("l"),
          element_at(syms, i + 1).alias("r"))))

  /** Learn up to `numMerges` merge rules from the corpus. Returns the
    * merge table `(rank, l, r, pair_count)` in learned order — the
    * artifact a tokenizer ships. Stops early if no adjacent pair is left.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    trainFromCounts(wordCounts(docs, textCol), numMerges)

  /** Train from an already-materialized `(word, cnt)` table — the seam
    * between the one corpus-sized pass and the vocab-sized iteration
    * loop. Every real trainer has this shape; a pipeline that already
    * keeps word counts (corpus statistics, LM features) reuses them here
    * and never touches the corpus again: per-merge cost depends on the
    * DISTINCT-WORD table alone, not on corpus size (measured flat across
    * 40× corpus growth, SCALING §21).
    */
  def trainFromCounts(counts: DataFrame, numMerges: Int): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // vocab table: compact by construction; checkpoint per iteration cuts
    // the k-deep lineage (k re-plans, not k corpus scans)
    var vocab = counts
      .select(col("cnt"), charSyms(col("word")).alias("syms"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = vocab
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).alias("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).alias("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect() // the argmax alone — 1 row, never the stats
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((rank, l, r, c))
        vocab = vocab.withColumn("syms", fuse(col("syms"), l, r))
          .localCheckpoint(true)
        rank += 1
      }
    }
    learned.toSeq.toDF("rank", "l", "r", "pair_count")
  }

  /** Tokenize with a learned merge table: per word, fold the merges in
    * rank order over the character symbols. `merges` is the local merge
    * list — it rides into the plan as literals (broadcast by value), so
    * tokenization is a pure map; for vocabulary-scale merge tables
    * (tens of thousands of rules) the expression tree gets deep and a
    * compiled-automaton `mapPartitions` kernel is the right trade — at
    * the merge counts an analytics pipeline learns in-engine, literals
    * win (no closure serialization, codegen-visible inputs).
    */
  def tokens(textCol: Column, merges: Seq[(String, String)]): Column = {
    val words = filter(split(textCol, "\\s+"), w => length(w) > 0)
    transform(words, w =>
      merges.foldLeft(charSyms(w)) { case (syms, (l, r)) => fuse(syms, l, r) })
  }

  /** Token count per document under a learned merge table. */
  def tokenCount(textCol: Column, merges: Seq[(String, String)]): Column =
    aggregate(tokens(textCol, merges), lit(0L), (acc, ts) => acc + size(ts))

  /** Per-document token counts at corpus scale: the k-merge fold runs
    * once per DISTINCT word (vocab-sized compute), and per-document
    * counts come from a broadcast word→count join plus one aggregation —
    * the [[tokenCount]] column fold, by contrast, pays the interpreted
    * k-layer fold for every word OCCURRENCE, which is the right trade
    * only for ad-hoc row-level use (measured 5× slower over the sf0.1
    * corpus: 13.0 s vs 2.4 s for the 8-merge gate). Returns
    * `(idCol, n_tokens)`.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(filter(split(col(textCol), "\\s+"),
        w => length(w) > 0)).alias("word"))
    val vocabNtok = toks.select("word").distinct()
      .withColumn("ntok", size(merges.foldLeft(charSyms(col("word"))) {
        case (s, (l, r)) => fuse(s, l, r)
      }))
    toks.join(broadcast(vocabNtok), Seq("word"))
      .groupBy(col(idCol)).agg(sum(col("ntok")).alias("n_tokens"))
  }
}
