package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed as-of join: for every left row, the single most recent right row
  * whose timestamp is at-or-before (backward, the default) the left row's
  * timestamp. The canonical point-in-time enrichment of an event stream
  * against a slowly-changing feed (prices, dimensions, prior activity) —
  * an operator the reference lacks and Spark has no built-in for.
  *
  * Implementation is the UNION-WINDOW form, not a range join: tag each
  * side, union, then one window pass per key ordered by time carries the
  * latest right payload forward onto every left row. Exactly ONE shuffle
  * (the window's hash partition on the key) and a per-partition sort —
  * no candidate-pair blowup, no range-condition nested loop, so the plan
  * survives arbitrarily dense right sides at 100 TB. Skew follows the key
  * distribution like any windowed aggregation (salt upstream if one key
  * dominates).
  */
object AsofJoin {

  /** Backward as-of join (`left.ts >= right.ts`, or `>` when `strict`).
    *
    * @param left     probe side; ALL its columns pass through
    * @param right    reference side
    * @param keyCols  equi-key column names present on both sides
    * @param leftTs   left ordering column (numeric or timestamp)
    * @param rightTs  right ordering column (same type)
    * @param payload  right columns to carry onto matching left rows
    * @param outPrefix prefix for the emitted payload columns (collision
    *                  guard when right and left share payload names)
    * @param strict   true = strictly-before (`>`): a right row AT the left
    *                 timestamp no longer matches
    * @return left columns + prefixed payload columns (null when no right
    *         row precedes the left row)
    *
    * TIES ON THE RIGHT SIDE: when several right rows share one (key, ts),
    * the window order among them is unspecified, so WHICH payload wins is
    * nondeterministic — same as HANA/DuckDB `ASOF JOIN` and pandas
    * `merge_asof` on an ambiguous right side. Dedup the right side first
    * (e.g. `max_by` per (key, ts)) if the payload must be deterministic.
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      outPrefix: String = "asof_", strict: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one equi-key")
    val lCols = left.columns.toSeq
    // internal columns must not collide with caller columns: suffix the
    // base names until they are fresh on BOTH sides (ADVICE r3 — a left
    // frame already containing `_ts` used to fail with ambiguous refs)
    // lowercased: Spark resolves names case-insensitively by default, so a
    // caller column `_TS` collides with internal `_ts` (ADVICE r4)
    val taken = (left.columns ++ right.columns).map(_.toLowerCase).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(c => taken(c.toLowerCase)).next()
    val (tsC, isRC, rpC, matchC) =
      (fresh("_ts"), fresh("_is_r"), fresh("_rp"), fresh("_match"))
    // a null right timestamp would sort FIRST in the window order and read
    // as "at-or-before everything" — but `l.ts >= null` is never true in
    // SQL as-of semantics, so such rows must not match anything
    val r = right.where(col(rightTs).isNotNull).select(
      keyCols.map(col) ++ Seq(
        col(rightTs).alias(tsC),
        lit(1).alias(isRC),
        struct(payload.map(col): _*).alias(rpC)): _*)
    val l = left.select(
      lCols.map(col) ++ Seq(
        col(leftTs).alias(tsC),
        lit(0).alias(isRC),
        lit(null).cast(r.schema(rpC).dataType).alias(rpC)): _*)
    // allowMissingColumns fills left-only columns with null on right rows
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // tie-break ordering encodes the inequality: for `>=`, a right row at
    // the same ts sorts BEFORE the left row (and is visible to it); for
    // strict `>`, it sorts after and is excluded
    val tieOrder = if (strict) col(isRC).asc else col(isRC).desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsC).asc, tieOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(matchC, last(col(rpC), ignoreNulls = true).over(w))
      .where(col(isRC) === 0)
      .select(lCols.map(col) ++
        payload.map(p => col(s"$matchC.$p").alias(outPrefix + p)): _*)
  }
}
