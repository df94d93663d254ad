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
  * the merge boundaries). Pair statistics are maintained INCREMENTALLY
  * (r13): the (pair → count) table is aggregated once up front; per merge,
  * only the words containing the fused pair retract their old pairs and
  * assert their new ones, so the per-iteration shuffle is O(affected
  * words), shrinking as merges specialize, while the full vocab is only
  * touched by a map-side conditional rewrite (no aggregation). The driver
  * sees exactly ONE row per merge (the argmax pair — same bounded-collect
  * class as KMeans' k×dim centroids). Ties break deterministically (count
  * desc, then pair lexicographically) so the learned table is
  * reproducible cross-engine.
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
  private[operators] def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).alias("l"),
          element_at(syms, i + 1).alias("r"))))

  /** Does the symbol sequence contain (l, r) adjacently? The affected-word
    * predicate for incremental pair-count maintenance: fusing (l, r) can
    * only change the pair statistics of words this is true for.
    */
  private[operators] def hasAdjacentPair(syms: Column, l: String, r: String): Column =
    exists(adjacentPairs(syms),
      p => p.getField("l") === lit(l) && p.getField("r") === lit(r))

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
  /** Metric name of the argmax riding each round's checkpoint action. */
  private val ArgmaxMetric = "bpe_argmax"

  /** The argmax pair as an OBSERVED aggregate — `min(struct(-c, l, r))`
    * over the retained pair rows is exactly the old
    * `orderBy(c desc, l, r).limit(1)` (struct ordering is field-major:
    * -c asc ≡ count desc, then pair lexicographically) — so the argmax
    * rides the SAME action that materializes the round's tables instead
    * of being its own job. Null over an empty pair table = exhausted.
    */
  private def observedArgmax(pairs: DataFrame): DataFrame =
    pairs.observe(ArgmaxMetric,
      min(struct((-col("c")).alias("nc"), col("l"), col("r"))).alias("top"))

  /** Read the observed argmax back from an EXECUTED query (the eager
    * checkpoint is the action). `queryExecution.observedMetrics` is
    * populated from the plan's own metric accumulators — no listener,
    * no extra job. Spec-pinned against the collect-based argmax.
    */
  private def argmaxOf(executed: DataFrame): Option[(String, String, Long)] =
    executed.queryExecution.observedMetrics.get(ArgmaxMetric).flatMap { row =>
      if (row.isNullAt(0)) None
      else {
        val t = row.getStruct(0)
        Some((t.getString(1), t.getString(2), -t.getLong(0)))
      }
    }

  def trainFromCounts(counts: DataFrame, numMerges: Int): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // ONE Spark job per merge round (r20, VERDICT r19 #6 — the per-round
    // cost of this loop is per-action planning floor, not compute): the
    // vocab table and the maintained pair table ride ONE tagged union,
    // eagerly checkpointed once per round, and the next round's argmax
    // rides that same action as an observed metric ([[observedArgmax]]).
    // The r19 shape ran 3 jobs per round (argmax collect + two separate
    // checkpoints). Each table is a lazy tag-filter over the shared
    // blocks; the previous round's blocks are released explicitly
    // (Checkpoints.release — Dataset.unpersist is a no-op on checkpoint
    // blocks), so executor storage holds two rounds' tables only at the
    // handoff instant.
    //
    // Incremental pair statistics (VERDICT r12 #4) are unchanged: fusing
    // (l, r) only changes the statistics of words that CONTAIN (l, r)
    // adjacently, so the per-round delta aggregates over the affected
    // subset alone and the maintained counts equal the full recompute by
    // arithmetic — the argmax, the (count desc, pair asc) tie-break, and
    // the learned table stay bit-identical (oracle-gated). The merged
    // pair's own net delta is exactly -count, so the `c > 0` retention
    // drops it without a special case.
    def tagged(vocabRows: DataFrame, pairRows: DataFrame): DataFrame =
      vocabRows.select(lit("v").alias("_t"), col("cnt"), col("syms"))
        .unionByName(
          observedArgmax(pairRows)
            .select(lit("p").alias("_t"), col("l"), col("r"), col("c")),
          allowMissingColumns = true)
    def vocabOf(combined: DataFrame): DataFrame =
      combined.where(col("_t") === "v").select(col("cnt"), col("syms"))
    def pairsOf(combined: DataFrame): DataFrame =
      combined.where(col("_t") === "p").select(col("l"), col("r"), col("c"))

    val vocab0 = counts
      .select(col("cnt"), charSyms(col("word")).alias("syms"))
    val pairs0 = vocab0
      .select(col("cnt"), explode(adjacentPairs(col("syms"))).alias("p"))
      .groupBy(col("p.l").alias("l"), col("p.r").alias("r"))
      .agg(sum(col("cnt")).alias("c"))
    var plan = tagged(vocab0, pairs0)
    var combined = plan.localCheckpoint(true) // round-0 job
    var top = argmaxOf(plan)
    val learned = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var rank = 1L
    while (rank <= numMerges && top.isDefined) {
      val (l, r, c) = top.get
      learned += ((rank, l, r, c))
      val vocab = vocabOf(combined)
      val hit = hasAdjacentPair(col("syms"), l, r)
      // retract old pairs / assert post-fuse pairs, affected words only;
      // the explode+shuffle volume is O(affected), not O(vocab)
      val delta = vocab.where(hit)
        .select(col("cnt"), col("syms"), fuse(col("syms"), l, r).alias("fused"))
        .select(explode(concat(
          transform(adjacentPairs(col("syms")),
            p => struct(p.getField("l").alias("l"), p.getField("r").alias("r"),
              (-col("cnt")).alias("d"))),
          transform(adjacentPairs(col("fused")),
            p => struct(p.getField("l").alias("l"), p.getField("r").alias("r"),
              col("cnt").alias("d"))))).alias("e"))
        .groupBy(col("e.l").alias("l"), col("e.r").alias("r"))
        .agg(sum(col("e.d")).alias("c"))
      val newPairs = pairsOf(combined).unionByName(delta)
        .groupBy(col("l"), col("r")).agg(sum(col("c")).alias("c"))
        .where(col("c") > 0)
      // untouched words pass through verbatim — a map-side conditional,
      // no shuffle; the checkpoint write is the honest per-merge floor
      // (O(vocab) bytes, zero aggregation)
      val newVocab = vocab.select(col("cnt"),
        when(hit, fuse(col("syms"), l, r)).otherwise(col("syms")).alias("syms"))
      val prev = combined
      plan = tagged(newVocab, newPairs)
      combined = plan.localCheckpoint(true) // the round's ONE job
      top = argmaxOf(plan)
      graft.util.Checkpoints.release(prev)
      rank += 1
    }
    graft.util.Checkpoints.release(combined)
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
    toks.join(broadcast(vocabTokensFold(toks, merges)
        .select(col("word"), size(col("toks")).alias("ntok"))),
      Seq("word"))
      .groupBy(col(idCol)).agg(sum(col("ntok")).alias("n_tokens"))
  }

  private def vocabTokensFold(toks: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    toks.select("word").distinct()
      .withColumn("toks", merges.foldLeft(charSyms(col("word"))) {
        case (s, (l, r)) => fuse(s, l, r)
      })

  // ── Vocabulary-scale serving: the compiled rank-priority automaton ──────

  /** The standard serving-side BPE apply (the GPT-2/SentencePiece encoder
    * loop) over one word: repeatedly find the PRESENT adjacent pair with
    * the lowest merge rank and fuse all its occurrences left-to-right
    * non-overlapping, until no ranked pair remains.
    *
    * For a TRAINER-CONSISTENT merge table — rank order = creation order,
    * so a rule mentioning symbol `lr` always ranks after the rule that
    * builds `lr`, which [[train]] guarantees by construction — this is
    * exactly [[tokens]]' fold-in-rank-order result: fusing the
    * lowest-ranked present pair can only CREATE pairs of higher rank
    * (any rule consuming the new symbol was learned later), so the
    * priority loop visits ranks non-decreasingly, which is the fold
    * order. An arbitrary hand-written table that violates consistency
    * (e.g. rank 1 = (ab, c), rank 2 = (a, b)) makes the two differ —
    * the spec pins both the equivalence and the counterexample.
    */
  private[operators] def applyWordCompiled(word: String,
      rank: java.util.HashMap[(String, String), Integer]): Array[String] = {
    var syms: Array[String] = {
      // initial symbols are CODE POINTS, not UTF-16 units: the trainer
      // and the literal fold symbolize through Spark's UTF8String substr
      // (code-point indexed), and a UTF-16 split here would break a
      // non-BMP word (an emoji) into unmatched surrogate halves —
      // diverging from both the trainer and any code-point engine
      // (caught by q_bpe_tokenize_unseen's cross-engine hash, r17)
      val out = Array.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        out += word.substring(i, i + n)
        i += n
      }
      out.result()
    }
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get((syms(i), syms(i + 1)))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // fuse every non-overlapping occurrence of the best pair,
        // left-to-right — same greedy semantics as [[fuse]]
        var l: String = null; var r: String = null
        var j = 0
        while (j < syms.length - 1 && l == null) {
          val rk = rank.get((syms(j), syms(j + 1)))
          if (rk != null && rk == best) { l = syms(j); r = syms(j + 1) }
          j += 1
        }
        val out = Array.newBuilder[String]
        j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms
  }

  /** `(word, toks)` for every DISTINCT word, tokenized by the compiled
    * rank-priority automaton — the vocabulary-scale twin of the literal
    * fold inside [[tokenCounts]]. The merge table rides ONCE as a task
    * broadcast (50k rules ≈ a few MB) instead of as k nested expression
    * layers: per-word cost is O(passes × |word|) with a HashMap probe per
    * adjacent pair, independent of k, where the fold pays k interpreted
    * layers per word — the trade the [[tokens]] Scaladoc promises at
    * vocabulary scale (SCALING §24 has the crossover measured).
    */
  def vocabTokensCompiled(toks: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val rankedB = spark.sparkContext.broadcast(merges.toArray)
    toks.select("word").distinct().as[String]
      .mapPartitions { it =>
        val rank = new java.util.HashMap[(String, String), Integer]()
        rankedB.value.zipWithIndex.foreach { case (p, i) =>
          // first occurrence wins: Map-literal last-wins would silently
          // re-rank a duplicated rule
          if (!rank.containsKey(p)) rank.put(p, i)
        }
        it.map(w => (w, applyWordCompiled(w, rank)))
      }
      .toDF("word", "toks")
  }

  /** [[tokenCounts]] on the compiled automaton: same distinct-word +
    * broadcast-join plan shape, with the per-word fold swapped for
    * [[applyWordCompiled]]. Use for vocabulary-scale merge tables (tens
    * of thousands of rules) where the literal fold's expression depth is
    * unworkable; results are identical for trainer-consistent tables.
    */
  def tokenCountsCompiled(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(filter(split(col(textCol), "\\s+"),
        w => length(w) > 0)).alias("word"))
    toks.join(broadcast(vocabTokensCompiled(toks, merges)
        .select(col("word"), size(col("toks")).alias("ntok"))),
      Seq("word"))
      .groupBy(col(idCol)).agg(sum(col("ntok")).alias("n_tokens"))
  }
}
