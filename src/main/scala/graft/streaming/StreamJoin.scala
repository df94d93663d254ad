package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming analog of the
  * CDC enrichment the reference performs batch-side per poll (join the
  * change feed against the other table's recent changes; cf.
  * `S4HanaProducer.java:511-533`'s joined-table select): match each left
  * event to right events with the same key whose event time falls inside
  * `[l.ts − before, l.ts + after]`.
  *
  * Both inputs carry explicit watermarks, which is what lets Spark bound
  * the join state: a buffered right row can be dropped once the LEFT
  * watermark passes `r.ts + before`, and vice versa — without the interval
  * condition the state would grow forever. This is Structured Streaming's
  * documented stream-stream join recipe (Spark SS guide §stream-stream
  * joins); the operator here packages the condition-building and the
  * outer-join constraints so callers can't accidentally produce an
  * unbounded-state plan.
  *
  * Scale shape: the join shuffles both streams on the key into the same
  * state-store partitioning (`spark.sql.shuffle.partitions` state stores);
  * per-key state holds only rows inside the watermark-bounded interval.
  * Skewed hot keys behave like any skewed stream agg — salt the key
  * upstream if one key dominates ([[graft.operators.Skew]] has the batch
  * recipe).
  *
  * `joinType` supports "inner" and "leftOuter". Outer results for
  * unmatched left rows emit only after the watermark proves no match can
  * still arrive — so an outer join's nulls are late by design, not a bug.
  */
object StreamJoin {

  /** @param left      streaming DataFrame, the driving side
    * @param right     streaming DataFrame to enrich from
    * @param leftKey   equality key column on `left`
    * @param rightKey  equality key column on `right` (distinct name)
    * @param leftTs    event-time column on `left` (timestamp type)
    * @param rightTs   event-time column on `right` (distinct name)
    * @param leftDelay  watermark delay for `left`, e.g. "10 seconds"
    * @param rightDelay watermark delay for `right`
    * @param before    how far BEFORE the left event a right match may be
    * @param after     how far AFTER the left event a right match may be
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      leftDelay: String, rightDelay: String,
      before: String = "0 seconds", after: String = "0 seconds",
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "leftOuter").contains(joinType),
      s"joinType must be inner or leftOuter, got $joinType")
    require(leftKey != rightKey && leftTs != rightTs,
      "key/ts column names must differ between sides (rename upstream); " +
        "ambiguous names make the interval condition unresolvable")
    val l = left.withWatermark(leftTs, leftDelay)
    val r = right.withWatermark(rightTs, rightDelay)
    val cond = col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) - expr(s"interval $before") &&
      col(rightTs) <= col(leftTs) + expr(s"interval $after")
    l.join(r, cond, joinType)
  }
}
