package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-shard assignment: lay documents out in a deterministic total
  * order and cut the sequence into shards of ~`budget` tokens (contiguous
  * fill — a document straddling a boundary starts the next shard's count;
  * simple, deterministic, and what sequence-packing pipelines actually do
  * before intra-shard shuffling).
  *
  * The running token count is a distributed prefix sum built on LITERAL
  * partition boundaries: P−1 approximate id-quantiles are computed once
  * (an EAGER narrow scan at call time — the one side effect of this
  * otherwise-lazy API) and baked into the plan as constants. Every
  * downstream pass is then a pure function of (row, cuts):
  *   1. per-bucket token totals (narrow scan + P-row shuffle) prefix-sum
  *      into per-bucket offsets via a tiny window;
  *   2. a per-bucket running sum (ordinary partitioned window — ONE full
  *      hash exchange) plus the broadcast offset yields the global count.
  * Because the bucket id is monotone in the order key and identical in
  * both passes BY CONSTRUCTION (same literals), correctness cannot depend
  * on exchange reuse, checkpoint survival, or resampling — any stage can
  * recompute freely, and the result is identical at any parallelism (the
  * cuts only shape partition sizes, never the assignment). Contrast both
  * rejected designs: a global `Window.orderBy(id)` funnels the corpus
  * through one task; deriving bucket ids from `repartitionByRange` +
  * `spark_partition_id()` re-executes a SAMPLED shuffle whose boundaries
  * may legally differ between subtrees.
  *
  * Quantile skew caveat: cut accuracy only affects bucket balance; at
  * extreme id skew raise the quantile precision or pre-scale P.
  */
object Shards {

  /** @param df       one row per document
    * @param idCol    unique, totally-ordered NUMERIC key (the layout
    *                 order; compared through double cast — monotone, so
    *                 boundary precision never affects correctness)
    * @param tokenCol per-document token count (integral; null counts 0)
    * @param budget   tokens per shard (> 0)
    * @return df + (cum_before = tokens laid out before this doc,
    *         shard = floor(cum_before / budget)); input columns untouched
    */
  def assignByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val p = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val cuts =
      if (p <= 1) Array.empty[Double]
      else df.stat.approxQuantile(idCol,
        (1 until p).map(_.toDouble / p).toArray, 0.01).distinct.sorted
    val bucket =
      if (cuts.isEmpty) lit(0)
      else size(filter(array(cuts.map(lit): _*),
        c => col(idCol).cast("double") > c))
    val tok = coalesce(col(tokenCol).cast(LongType), lit(0L))
    val totals = df
      .select(bucket.alias("_pid"), tok.alias("_tok"))
      .groupBy(col("_pid")).agg(sum(col("_tok")).alias("_ptotal"))
    val offsets = totals // ≤P rows: the single-partition window is trivial
      .withColumn("_offset", coalesce(
        sum(col("_ptotal")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_offset"))
    val runW = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_pid", bucket)
      .withColumn("_run", sum(tok).over(runW))
      .join(broadcast(offsets), "_pid")
      .withColumn("cum_before", (col("_offset") + col("_run") - tok).cast(LongType))
      .withColumn("shard", floor(col("cum_before") / budget))
      .drop("_pid", "_run", "_offset")
  }

  /** Materialize the packed training sequences: one row per shard with the
    * member documents concatenated in layout (id) order, separated by
    * `eos` — the concat-and-chunk step GPT-style pipelines run after
    * [[assignByTokenBudget]] decides the cut points.
    *
    * Output: (shard, n_docs, n_tokens, text). The per-shard group is
    * bounded by `budget` tokens BY CONSTRUCTION (plus the one straddling
    * document), so the `collect_list` buffer a task holds is a few KB —
    * this is the rare place collecting a group to one task is provably
    * safe at any corpus size. The sort inside each group is `array_sort`
    * over (id, text) structs: deterministic, no window, no extra shuffle
    * beyond the one groupBy(shard).
    */
  /** The SPAN-level packing manifest: fixed-length training sequences of
    * exactly `budget` tokens cut across document boundaries (GPT-style
    * concat-and-chunk — [[assignByTokenBudget]] keeps documents whole and
    * lets shards run ragged; a training loader wants the dual: ragged
    * documents, exact-length sequences). One row per (document × sequence
    * it intersects):
    *
    *   - `seq`        fixed-length sequence index (`floor(pos / budget)`)
    *   - `tok_start`/`tok_end`  the [start, end) slice of THIS document's
    *                  tokens that lands in `seq`
    *   - `seq_offset` where that slice begins inside the sequence
    *
    * so `(seq, seq_offset, doc slice)` reassembles every sequence exactly,
    * and a loader can group by `seq` to materialize batches while keeping
    * doc provenance for attention-mask resets at document joins.
    *
    * Everything after the prefix sum is per-row integer arithmetic plus a
    * bounded explode (a doc of T tokens spans ≤ T/budget + 1 sequences —
    * output size is Σtokens/budget + ndocs rows, linear); no new shuffle
    * beyond [[assignByTokenBudget]]'s, and the whole manifest is exact
    * integer arithmetic an external engine replays (the gate's DuckDB
    * oracle does, via the same window sum + generate_series).
    *
    * Zero-token documents contribute nothing to any sequence and are
    * dropped from the manifest (they have no slice to place).
    */
  def packSpans(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val tok = coalesce(col(tokenCol).cast(LongType), lit(0L))
    assignByTokenBudget(df, idCol, tokenCol, budget)
      .where(tok > 0)
      .withColumn("seq", explode(sequence(
        floor(col("cum_before") / budget),
        floor((col("cum_before") + tok - 1) / budget))))
      .withColumn("tok_start",
        greatest(lit(0L), col("seq") * budget - col("cum_before")))
      .withColumn("tok_end",
        least(tok, (col("seq") + 1) * budget - col("cum_before")))
      .withColumn("seq_offset",
        greatest(lit(0L), col("cum_before") - col("seq") * budget))
  }

  def packText(df: DataFrame, idCol: String, textCol: String,
      tokenCol: String, budget: Long,
      eos: String = "<|endoftext|>"): DataFrame =
    assignByTokenBudget(df, idCol, tokenCol, budget)
      .groupBy(col("shard"))
      .agg(count(lit(1)).alias("n_docs"),
        sum(coalesce(col(tokenCol).cast(LongType), lit(0L))).alias("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol).alias("_id"),
              col(textCol).alias("_t")))),
            s => s.getField("_t")),
          eos).alias("text"))
}
