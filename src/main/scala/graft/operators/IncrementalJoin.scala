package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental equi-join maintenance (materialized-view maintenance) under
  * CDC folds on BOTH sides: keep `V = left ⋈ right` current by replacing
  * only the view rows a batch touched — never re-joining the full tables.
  *
  * This is the join sibling of [[IncrementalAgg]] and the second analytics
  * payoff of the CDC core (the reference replicates tables, SURVEY.md §0;
  * a consumer keeping a denormalized join of two replicas current would
  * otherwise re-join per poll). The classic delta-join identity
  * `ΔV = Δleft ⋈ right  ∪  left' ⋈ Δright` is expressed here over the
  * FOLDED batch (changed-key sets + current replicas), which also covers
  * deletes and join-key changes uniformly:
  *
  *   - view rows whose left PK or join key was touched are dropped
  *     (two broadcast ANTI joins — a map-side scan of the view);
  *   - current left rows whose PK or join key was touched are re-joined
  *     against the current right (the refresh side is batch-sized, so it
  *     BROADCASTS — the right table is scanned map-side, never shuffled).
  *
  * Total per-batch cost at 100 TB: one map-side scan of the view + one
  * map-side scan of the right table, ZERO shuffles, O(changed keys)
  * output rows. Neither base table is ever re-joined wholesale. (If the
  * right table dominates and batches touch few join keys, partition or
  * bucket it by the join key so the refresh join prunes its scan too —
  * the broadcast keys make that dynamic-partition-pruning friendly.)
  *
  * Correctness contract (spec-pinned, and hash-gated in
  * `q_cdc_join_maintain` against a DuckDB full re-join):
  * `maintain(view(oldL, oldR), L', R', touchedL, touchedR)
  *  == view(L', R')` provided the touched-key frames carry BOTH images of
  * every change — old and new PK / join-key values. The CDC fold gives
  * exactly that: upserts and deletes list their key, and a PK change
  * arrives as the delete+insert double record
  * (`Cdc.splitPkChange`, SURVEY §2 ST5).
  */
object IncrementalJoin {

  /** The materialized form this module maintains: an inner equi-join with
    * the right key column dropped (it duplicates the left join column).
    * Build the initial view with this; [[maintainJoinView]] keeps its
    * schema.
    */
  def joinView(left: DataFrame, right: DataFrame,
      leftJoinCol: String, rightKeyCol: String): DataFrame =
    left.join(right, left(leftJoinCol) === right(rightKeyCol), "inner")
      .drop(right(rightKeyCol))

  /** Apply one folded CDC batch (either or both sides) to a materialized
    * [[joinView]].
    *
    * @param oldView  the current materialized view
    * @param left     CURRENT left replica (post-fold)
    * @param right    CURRENT right replica (post-fold)
    * @param touchedLeftPks  single-column frame of every left PK the batch
    *                 touched — upserted, deleted, old AND new on PK change
    * @param touchedRightKeys single-column frame of every right join-key
    *                 value the batch touched, both images likewise
    * @param leftPk   left primary-key column (in view and left)
    * @param leftJoinCol / rightKeyCol equi-join columns
    * @param broadcastChanged escape hatch: disable the broadcast hints if
    *                 a pathological batch touches more keys than the
    *                 driver can hold (falls back to shuffled joins —
    *                 correct, just not shuffle-free)
    */
  def maintainJoinView(oldView: DataFrame, left: DataFrame, right: DataFrame,
      touchedLeftPks: DataFrame, touchedRightKeys: DataFrame,
      leftPk: String, leftJoinCol: String, rightKeyCol: String,
      broadcastChanged: Boolean = true): DataFrame = {
    def hint(df: DataFrame): DataFrame = if (broadcastChanged) broadcast(df) else df
    val clk = hint(touchedLeftPks.toDF("_touched_pk").distinct())
    val crk = hint(touchedRightKeys.toDF("_touched_jk").distinct())

    // Map-side view scan: drop every row a touched key could have produced.
    // The view's stored join key is the row's OLD value, so a join-key
    // change is caught by the PK anti (old row) + the refresh side (new).
    val untouched = oldView
      .join(clk, col(leftPk) === col("_touched_pk"), "left_anti")
      .join(crk, col(leftJoinCol) === col("_touched_jk"), "left_anti")

    // One pass over the current left marks the refresh set: PK touched, or
    // join key pointing at a touched right key. Deleted rows are simply
    // absent from `left`; left rows joining a deleted right row produce
    // nothing below. coalesce() keeps NULL join keys out (they cannot be
    // in an inner-join view).
    val refreshSrc = left
      .join(clk.withColumn("_chl", lit(true)),
        col(leftPk) === col("_touched_pk"), "left")
      .join(crk.withColumn("_chr", lit(true)),
        col(leftJoinCol) === col("_touched_jk"), "left")
      .where(coalesce(col("_chl"), lit(false)) ||
        coalesce(col("_chr"), lit(false)))
      .drop("_touched_pk", "_chl", "_touched_jk", "_chr")

    untouched.unionByName(
      joinView(hint(refreshSrc), right, leftJoinCol, rightKeyCol))
  }
}
