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
    var vocab = counts
      .select(col("cnt"), BpeTrain.charSyms(col("word")).alias("syms"))
      .localCheckpoint(true)
    var pairCounts = vocab
      .select(col("cnt"), explode(BpeTrain.adjacentPairs(col("syms"))).alias("p"))
      .groupBy(col("p.l").alias("l"), col("p.r").alias("r"))
      .agg(sum(col("cnt")).alias("c"))
      .localCheckpoint(true)
    // symbol occurrence counts — the likelihood denominator; maintained
    // incrementally exactly like the pair table
    var symCounts = vocab
      .select(col("cnt"), explode(col("syms")).alias("sym"))
      .groupBy(col("sym")).agg(sum(col("cnt")).alias("c"))
      .localCheckpoint(true)
    val learned =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, Long, Long)]()
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
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
        val prevPairs = pairCounts
        pairCounts = pairCounts.unionByName(pairDelta)
          .groupBy(col("l"), col("r")).agg(sum(col("c")).alias("c"))
          .where(col("c") > 0)
          .localCheckpoint(true)
        prevPairs.unpersist()
        val prevSyms = symCounts
        symCounts = symCounts.unionByName(symDelta)
          .groupBy(col("sym")).agg(sum(col("c")).alias("c"))
          .where(col("c") > 0)
          .localCheckpoint(true)
        prevSyms.unpersist()
        val prevVocab = vocab
        vocab = vocab.select(col("cnt"),
          when(hit, BpeTrain.fuse(col("syms"), l, r)).otherwise(col("syms"))
            .alias("syms"))
          .localCheckpoint(true)
        prevVocab.unpersist()
        affected.unpersist()
        rank += 1
      }
    }
    vocab.unpersist()
    pairCounts.unpersist()
    symCounts.unpersist()
    learned.toSeq.toDF("rank", "l", "r", "score_q", "pair_count")
  }
}
