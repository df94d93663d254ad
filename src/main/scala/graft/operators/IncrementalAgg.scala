package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.SketchOps

/** Incremental aggregate maintenance (materialized-view maintenance) under
  * a CDC fold: keep a `GROUP BY` count/sum aggregate current by applying
  * per-group retractions for the changed keys' OLD rows and additions for
  * their NEW rows — never rescanning the base table.
  *
  * This is the analytics payoff of the CDC core: the reference replicates
  * tables (SURVEY.md §0); a consumer maintaining aggregates over the
  * replica would otherwise recompute per poll. At 100 TB the base scan is
  * the cost ceiling — maintenance touches only O(changed keys) rows plus
  * the aggregate table itself, and every step is an equi-join/aggregation
  * Catalyst plans like any other (the changed-key side is batch-sized, so
  * its joins broadcast).
  *
  * Correctness contract (tested, and hash-checked in `q_cdc_agg_maintain`
  * against a DuckDB full recompute): for additive aggregates
  * (count, sum — avg derives as s/n),
  * `maintain(agg(old), oldRowsOfChangedKeys, newRowsOfChangedKeys)
  *  == agg(fold(old, changes))`.
  */
object IncrementalAgg {

  /** Apply one folded CDC batch to a (group, n, s) count/sum aggregate.
    *
    * @param oldAgg  current aggregate: (groupCol, nCol, sCol)
    * @param oldRows OLD base rows of every changed key (upserted or
    *                deleted) — their contributions retract
    * @param newRows NEW rows of the changed keys that survive the batch
    *                (upserts only; deleted keys simply have no new row)
    * @param groupCol grouping column name (same on all three inputs)
    * @param valueCol summed measure on oldRows/newRows (use an exact
    *                 DECIMAL column — float sums would drift under
    *                 retraction)
    * @param nCol/sCol the aggregate's count and sum column names
    * @return the updated aggregate, groups with count 0 removed
    */
  def maintainCountSum(oldAgg: DataFrame, oldRows: DataFrame,
      newRows: DataFrame, groupCol: String, valueCol: String,
      nCol: String = "n", sCol: String = "s"): DataFrame = {
    val retract = oldRows.groupBy(col(groupCol)).agg(
      (-count(lit(1))).alias(nCol),
      (-sum(col(valueCol))).alias(sCol))
    val add = newRows.groupBy(col(groupCol)).agg(
      count(lit(1)).alias(nCol),
      sum(col(valueCol)).alias(sCol))
    oldAgg.select(col(groupCol), col(nCol), col(sCol))
      .unionByName(retract).unionByName(add)
      .groupBy(col(groupCol))
      .agg(sum(col(nCol)).alias(nCol), sum(col(sCol)).alias(sCol))
      .where(col(nCol) =!= 0)
  }

  // ── Maintainable COUNT DISTINCT (HLL sketches) ──────────────────────────
  // Retraction algebra cannot maintain distincts: a deleted row might or
  // might not have been a key's last copy, and answering that requires the
  // base. For ADD-ONLY feeds (append streams — events, logs, the usual
  // distinct-count dashboards) a per-group HLL sketch IS maintainable:
  // merging batch registers into stored registers by max is associative,
  // commutative, and IDEMPOTENT, so replays are free and the maintained
  // sketch is bit-identical to one built from scratch (spec-pinned).

  /** Build per-group HLL registers from key hashes (partial-aggregating:
    * each task folds its rows into one 4 KB buffer per group).
    */
  private class HllBuild extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = SketchOps.hllZero()
    override def reduce(b: Array[Byte], h: Long): Array[Byte] =
      SketchOps.hllAdd(b, h)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      SketchOps.hllMerge(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge already-built sketches (the union side of maintenance). */
  private class HllUnion extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = SketchOps.hllZero()
    override def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] =
      SketchOps.hllMerge(b, s)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      SketchOps.hllMerge(a, b)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Per-group distinct sketch of `keyCol`: (group, sketch, n_distinct_est).
    * One shuffle of |groups| 4 KB buffers after map-side partials.
    *
    * Register hash is the CROSS-ENGINE `fnv64` over the key's string form
    * (r10; previously Spark-internal xxhash64): with a reproducible hash,
    * the whole register array AND the estimator replay in plain SQL — the
    * `q_cdc_distinct_maintain` gate hash-matches DuckDB rebuilding every
    * register from scratch, so the estimates a 100 TB run reports verify
    * off-cluster. Same hash quality class for HLL purposes (64-bit
    * avalanche-adequate); error envelope specs unchanged.
    */
  def distinctSketch(rows: DataFrame, groupCol: String,
      keyCol: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    // null keys hash via a sentinel (U+0001 — cannot collide with any
    // numeric/normal key; DuckDB chr(1) replays it): fnv64 is
    // null-intolerant and a bare null _h would crash the typed encoder,
    // where the old xxhash64 silently hashed nulls (review r10)
    rows.select(col(groupCol).cast("string").alias("_g"),
        graft.functions.GraftExpressions.fnv64(
            coalesce(col(keyCol).cast("string"), lit("\u0001")))
          .alias("_h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new HllBuild().toColumn.name("sketch"))
      .toDF(groupCol, "sketch")
      .withColumn("n_distinct_est",
        graft.functions.GraftExpressions.hll_estimate(col("sketch")))
  }

  /** Maintain stored per-group sketches under one ADD-ONLY batch: build
    * the batch's sketches, register-max-merge into the stored ones. Groups
    * born in the batch appear; existing groups only grow (add-only). The
    * result is bit-identical to [[distinctSketch]] over the full history —
    * replays included, because the merge is idempotent.
    */
  def maintainDistinct(oldSketches: DataFrame, newRows: DataFrame,
      groupCol: String, keyCol: String): DataFrame = {
    val spark = oldSketches.sparkSession
    import spark.implicits._
    val batch = distinctSketch(newRows, groupCol, keyCol)
      .select(col(groupCol), col("sketch"))
    oldSketches.select(col(groupCol).cast("string").alias(groupCol),
        col("sketch"))
      .unionByName(batch)
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new HllUnion().toColumn.name("sketch"))
      .toDF(groupCol, "sketch")
      .withColumn("n_distinct_est",
        graft.functions.GraftExpressions.hll_estimate(col("sketch")))
  }

  // ── EXACT maintainable COUNT DISTINCT (refcounted support table) ───────
  // The HLL caveat above ("retraction cannot maintain distincts") holds
  // only WITHOUT auxiliary state. With a (group, value, cnt) multiplicity
  // table — the materialized-view-engine approach — retraction works
  // exactly: a delete decrements the value's refcount and the value stops
  // counting precisely when its count reaches zero. The price is the
  // support table's |distinct (group, value) pairs| footprint; the HLL
  // path stays as the bounded-memory alternative, and this one serves
  // deletes + exact answers. Maintenance touches O(changed rows) plus the
  // support table via one partial-aggregating shuffle on (group, value).

  /** Build the support table (groupCol, valueCol, cntCol) from base rows. */
  def buildDistinctSupport(base: DataFrame, groupCol: String,
      valueCol: String, cntCol: String = "cnt"): DataFrame =
    base.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).alias(cntCol))

  /** Apply one folded CDC batch: retract the changed keys' OLD rows,
    * add their surviving NEW rows, drop zero-count values. Same calling
    * contract as [[maintainCountSum]]: `maintain(support(old), oldRows,
    * newRows) == support(fold(old, changes))` — spec-pinned and
    * oracle-gated via the distinct counts.
    */
  def maintainDistinctSupport(support: DataFrame, oldRows: DataFrame,
      newRows: DataFrame, groupCol: String, valueCol: String,
      cntCol: String = "cnt"): DataFrame = {
    val retract = oldRows.groupBy(col(groupCol), col(valueCol))
      .agg((-count(lit(1))).alias(cntCol))
    val add = newRows.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).alias(cntCol))
    support.select(col(groupCol), col(valueCol), col(cntCol))
      .unionByName(retract).unionByName(add)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(cntCol)).alias(cntCol))
      .where(col(cntCol) > 0)
  }

  /** The exact distinct counts the support table maintains:
    * (groupCol, n_distinct).
    */
  def distinctFromSupport(support: DataFrame, groupCol: String,
      outCol: String = "n_distinct"): DataFrame =
    support.groupBy(col(groupCol)).agg(count(lit(1)).alias(outCol))
}
