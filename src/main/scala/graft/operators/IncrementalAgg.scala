package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
