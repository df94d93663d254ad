package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed WordPiece tokenizer TRAINING — the third learned-vocabulary
  * trainer next to [[BpeTrain]] (frequency argmax) and [[UnigramLm]]
  * (EM + prune): Schuster & Nakajima 2012's likelihood criterion, as the
  * BERT tokenizer's trainer popularized it. The loop is BPE's — repeat:
  * pick a symbol pair, fuse greedily left-to-right — but the pick
  * maximizes the LIKELIHOOD RATIO `count(l,r) / (count(l) · count(r))`
  * (the corpus-LM gain of merging) instead of the raw pair count, so a
  * pair of RARE symbols that almost always co-occur merges before a pair
  * of frequent ones that merely collide often.
  *
  * Determinism contract: the score is quantized WITHOUT transcendentals —
  * `q = floor((c · 1e12) / (c_l · c_r))` over exact-from-integer doubles.
  * Every step (int→double conversion, multiply, divide, floor) is an IEEE
  * operation with a specified correctly-rounded result, so ANY two
  * engines agree bit-for-bit — stronger than the micro-nat ln/exp
  * quantization the unigram gates ride (those are within-1-ulp
  * transcendentals; this is exact). Ties break (q desc, l asc, r asc).
  * The quantized score IS the contract: two rationals inside the same
  * 1e-12 quantum tie and fall to the lexicographic break.
  *
  * 100 TB design, inherited from [[BpeTrain]] and kept incremental: ONE
  * corpus shuffle to `(word, count)`; per merge, BOTH maintained
  * statistics tables — pair counts AND symbol counts — fold in deltas
  * aggregated over the affected-word subset alone (retract pre-fuse,
  * assert post-fuse), the argmax is a vocab-bounded join + 1-row collect,
  * and the vocab rewrite is a map-side conditional. Serving needs no new
  * kernel: the learned table applies through the SAME greedy fusion as
  * BPE ([[BpeTrain.tokenCounts]] / [[BpeTrain.tokenCountsCompiled]]),
  * marker-free like the rest of the tokenizer family (`##` continuation
  * prefixes are a presentation convention over the same merges).
  */
object WordPieceTrain {

  /** Learn up to `numMerges` merges by the likelihood criterion. Returns
    * `(rank, l, r, score_q, pair_count)` in learned order — score_q is
    * the quantized likelihood ratio the argmax ranked by.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame =
    trainFromCounts(BpeTrain.wordCounts(docs, textCol), numMerges)

  /** Train from a materialized `(word, cnt)` table — the corpus-once seam
    * ([[BpeTrain.trainFromCounts]]'s contract, likelihood-scored).
    */
  def trainFromCounts(counts: DataFrame, numMerges: Int): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // THREE jobs per merge round instead of five (r20, VERDICT r19 #6 —
    // the loop's cost is per-action planning floor, not compute): the
    // vocab table, pair table, and symbol table ride ONE tagged union
    // checkpointed once per round ([[BpeTrain.trainFromCounts]] has the
    // pattern's full rationale; here the argmax keeps its own collect
    // because the likelihood score joins pairs against symbol counts,
    // which an observed aggregate cannot express), plus the affected-word
    // checkpoint that feeds both delta folds. Blocks are released
    // explicitly — Dataset.unpersist is a no-op on checkpoint blocks.
    def tagged(vocabRows: DataFrame, pairRows: DataFrame,
        symRows: DataFrame): DataFrame =
      vocabRows.select(lit("v").alias("_t"), col("cnt"), col("syms"))
        .unionByName(
          pairRows.select(lit("p").alias("_t"), col("l"), col("r"), col("c")),
          allowMissingColumns = true)
        .unionByName(
          symRows.select(lit("s").alias("_t"), col("sym"), col("c")),
          allowMissingColumns = true)
    def vocabOf(combined: DataFrame): DataFrame =
      combined.where(col("_t") === "v").select(col("cnt"), col("syms"))
    def pairsOf(combined: DataFrame): DataFrame =
      combined.where(col("_t") === "p").select(col("l"), col("r"), col("c"))
    def symsOf(combined: DataFrame): DataFrame =
      combined.where(col("_t") === "s").select(col("sym"), col("c"))

    val vocab0 = counts
      .select(col("cnt"), BpeTrain.charSyms(col("word")).alias("syms"))
    val pairs0 = vocab0
      .select(col("cnt"), explode(BpeTrain.adjacentPairs(col("syms"))).alias("p"))
      .groupBy(col("p.l").alias("l"), col("p.r").alias("r"))
      .agg(sum(col("cnt")).alias("c"))
    // symbol occurrence counts — the likelihood denominator; maintained
    // incrementally exactly like the pair table
    val syms0 = vocab0
      .select(col("cnt"), explode(col("syms")).alias("sym"))
      .groupBy(col("sym")).agg(sum(col("cnt")).alias("c"))
    var combined = tagged(vocab0, pairs0, syms0).localCheckpoint(true)
    val learned =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, Long, Long)]()
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val pairCounts = pairsOf(combined)
      val symCounts = symsOf(combined)
      val top = pairCounts.alias("p")
        .join(symCounts.alias("sl"), col("p.l") === col("sl.sym"))
        .join(symCounts.alias("sr"), col("p.r") === col("sr.sym"))
        .select(col("p.l").alias("l"), col("p.r").alias("r"),
          col("p.c").alias("c"),
          floor((col("p.c").cast("double") * lit(1e12)) /
            (col("sl.c").cast("double") * col("sr.c").cast("double")))
            .cast(LongType).alias("q"))
        .orderBy(col("q").desc, col("l"), col("r"))
        .limit(1).collect() // the argmax alone — 1 row, never the stats
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c, q) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2), top(0).getLong(3))
        learned += ((rank, l, r, q, c))
        val vocab = vocabOf(combined)
        val hit = BpeTrain.hasAdjacentPair(col("syms"), l, r)
        val affected = vocab.where(hit)
          .select(col("cnt"), col("syms"),
            BpeTrain.fuse(col("syms"), l, r).alias("fused"))
          .localCheckpoint(true) // feeds BOTH delta folds once
        val pairDelta = affected
          .select(explode(concat(
            transform(BpeTrain.adjacentPairs(col("syms")),
              p => struct(p.getField("l").alias("l"), p.getField("r").alias("r"),
                (-col("cnt")).alias("d"))),
            transform(BpeTrain.adjacentPairs(col("fused")),
              p => struct(p.getField("l").alias("l"), p.getField("r").alias("r"),
                col("cnt").alias("d"))))).alias("e"))
          .groupBy(col("e.l").alias("l"), col("e.r").alias("r"))
          .agg(sum(col("e.d")).alias("c"))
        val symDelta = affected
          .select(explode(concat(
            transform(col("syms"),
              s => struct(s.alias("sym"), (-col("cnt")).alias("d"))),
            transform(col("fused"),
              s => struct(s.alias("sym"), col("cnt").alias("d"))))).alias("e"))
          .groupBy(col("e.sym").alias("sym"))
          .agg(sum(col("e.d")).alias("c"))
        val newPairs = pairCounts.unionByName(pairDelta)
          .groupBy(col("l"), col("r")).agg(sum(col("c")).alias("c"))
          .where(col("c") > 0)
        val newSyms = symCounts.unionByName(symDelta)
          .groupBy(col("sym")).agg(sum(col("c")).alias("c"))
          .where(col("c") > 0)
        val newVocab = vocab.select(col("cnt"),
          when(hit, BpeTrain.fuse(col("syms"), l, r)).otherwise(col("syms"))
            .alias("syms"))
        val prev = combined
        combined = tagged(newVocab, newPairs, newSyms).localCheckpoint(true)
        graft.util.Checkpoints.release(prev)
        graft.util.Checkpoints.release(affected)
        rank += 1
      }
    }
    graft.util.Checkpoints.release(combined)
    learned.toSeq.toDF("rank", "l", "r", "score_q", "pair_count")
  }
}
