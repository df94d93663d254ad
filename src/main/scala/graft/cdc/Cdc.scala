package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The CDC core: change-log shape, delta fold, and initial-load envelope.
  *
  * Re-expresses the reference's generated delta/initial SQL as native Spark
  * plans:
  *   - change-log (PKLOG) shape: `S4HanaProducer.java:99-111`
  *   - delta select = dedupe changed PKs (GROUP BY pk / MAX(txid)) LEFT OUTER
  *     JOIN master, CASE WHEN to derive delete-vs-upsert:
  *     `S4HanaTableMapping.java:444-471`
  *   - driver-side PK projection (deletes still carry their key):
  *     `S4HanaTableMapping.java:530-536`
  *   - initial load `SELECT 'I', null, … [WHERE residual]`:
  *     `S4HanaTableMapping.java:740-761`
  *   - change-type fold D→DELETE else UPSERT: `S4HanaProducer.java:434-441`
  *
  * Scale design: the deduped changed-key side of the delta join is tiny
  * relative to the master table (a poll window's distinct keys vs. the full
  * table), so the join broadcasts the aggregated key set — the master table
  * is NEVER shuffled. At 100 TB this is the difference between a map-side
  * join and a full-table exchange. The aggregation itself map-side-combines
  * (partial max) before its shuffle, so the shuffle volume is one row per
  * (partition × key), not one per change.
  */
object Cdc {

  // Envelope column names (FIXTURES.md §3).
  val ChangeType = "_change_type"
  val TransactionId = "_transactionid"
  val SourceRowId = "_source_rowid"

  val Insert = "I" // initial load (S4HanaProducer.java:623)
  val Upsert = "A" // delta row whose master row exists
  val Delete = "D" // delta row whose master row is gone

  /** PKLOG change-log schema — mirror of the reference control table
    * (`S4HanaProducer.java:99-111`). PK1..PK6 generic string key slots.
    */
  val PkLogSchema: StructType = StructType(Seq(
    StructField("CHANGE_TS", TimestampType),
    StructField("SCHEMA_NAME", StringType),
    StructField("CHANGE_TYPE", StringType), // 'I' | 'U' | 'D'
    StructField("PK1", StringType), StructField("PK2", StringType),
    StructField("PK3", StringType), StructField("PK4", StringType),
    StructField("PK5", StringType), StructField("PK6", StringType),
    StructField("TRANSACTIONID", LongType),
    StructField("TRANSACTION_SEQ", IntegerType),
    StructField("TABLE_NAME", StringType)))

  /** The per-table change view: rename the generic PK1..PKn slots back to the
    * real PK column names and filter to one table — mirror of
    * `<T>_CHANGE_VIEW` (`S4HanaTableMapping.java:407-442`).
    */
  def changeView(pklog: DataFrame, tableName: String, pkNames: Seq[String]): DataFrame = {
    require(pkNames.nonEmpty && pkNames.size <= 6, "1..6 PK columns")
    val pkCols = pkNames.zipWithIndex.map { case (n, i) => col(s"PK${i + 1}").alias(n) }
    pklog
      .where(col("TABLE_NAME") === tableName)
      .select(pkCols :+ col("TRANSACTIONID").alias(TransactionId): _*)
  }

  /** Transaction-window filter `(lo, hi]` — the poll window
    * (`S4HanaTableMapping.java:458`, `S4HanaProducer.java:400`).
    */
  def windowFilter(changes: DataFrame, txidCol: String, lo: Long, hi: Long): DataFrame =
    changes.where(col(txidCol) > lo && col(txidCol) <= hi)

  /** Last-change-wins dedup: collapse N changes per key to 1, keeping the
    * highest transaction id (`S4HanaTableMapping.java:454-461`).
    * Partial (map-side) aggregation makes the shuffle proportional to
    * distinct keys, not change volume.
    */
  def latestPerKey(changes: DataFrame, keyCols: Seq[String],
      txidCol: String = TransactionId): DataFrame =
    changes.groupBy(keyCols.map(col): _*)
      .agg(max(col(txidCol)).alias(txidCol))

  /** The delta fold: deduped changed keys vs. the master table on the PK;
    * a missing master row means the key was deleted
    * (`S4HanaTableMapping.java:444-471`; join condition `:507-521`).
    *
    * PK columns in the output come from the key side so deletes still carry
    * their key (`S4HanaTableMapping.java:530-536`); non-PK columns are null
    * on 'D'.
    *
    * The naive plan — `keys LEFT OUTER JOIN master` — cannot broadcast the
    * small side (a broadcast hash join can't build on the outer-preserved
    * side), so Spark would sort-merge-join and SHUFFLE THE ENTIRE MASTER
    * TABLE. Instead:
    *   1. `master INNER JOIN broadcast(keys)` — a map-side pass over the
    *      master scan, zero master shuffle → the upsert rows;
    *   2. union with per-key delete candidates (null non-key columns);
    *   3. one small aggregation over ≤2 rows/key picks the upsert when the
    *      master row existed, else the delete.
    * The only shuffle moves O(changed keys) rows, never O(master).
    *
    * @param changedKeys ONE row per changed key (latestPerKey output), with
    *                    `txidCol`. Small: broadcast by default.
    * @param master      the current master table; PK is assumed unique.
    * @param keyJoin     (changeKeyCol, masterKeyCol) pairs, composite PK order.
    */
  def foldChanges(changedKeys: DataFrame, master: DataFrame,
      keyJoin: Seq[(String, String)], txidCol: String = TransactionId,
      broadcastKeys: Boolean = true): DataFrame = {
    val keyOut = keyJoin.map(_._1)
    val nonKey = master.columns.toSeq.filterNot(keyJoin.map(_._2).contains)
    val l = changedKeys.alias("l")
    val lSide = if (broadcastKeys) broadcast(l) else l
    val m = master.alias("m")
    val cond = keyJoin.map { case (lk, mk) => col(s"l.$lk") === col(s"m.$mk") }
      .reduce(_ && _)
    val upserts = m.join(lSide, cond, "inner").select(
      lit(Upsert).alias(ChangeType) +:
        col(s"l.$txidCol").alias(TransactionId) +:
        keyJoin.map { case (lk, _) => col(s"l.$lk").alias(lk) } ++:
        nonKey.map(c => col(s"m.$c").alias(c)): _*)
    val deleteCandidates = changedKeys.select(
      lit(Delete).alias(ChangeType) +:
        col(txidCol).alias(TransactionId) +:
        keyOut.map(col) ++:
        nonKey.map(c => lit(null).cast(master.schema(c).dataType).alias(c)): _*)
    val payload = struct(col(ChangeType) +: col(TransactionId) +: nonKey.map(col): _*)
    upserts.unionByName(deleteCandidates)
      .groupBy(keyOut.map(col): _*)
      .agg(max_by(payload,
        when(col(ChangeType) === Upsert, 1).otherwise(0)).alias("_p"))
      .select(
        col(s"_p.$ChangeType").alias(ChangeType) +:
          col(s"_p.$TransactionId").alias(TransactionId) +:
          keyOut.map(col) ++:
          nonKey.map(c => col(s"_p.$c").alias(c)): _*)
  }

  /** Whole delta poll for one mapping: window → latest-per-key → fold.
    * The Spark shape of `S4HanaProducer.poll` SQL #3
    * (`S4HanaTableMapping.java:444-471`).
    */
  def delta(changeFeed: DataFrame, master: DataFrame,
      keyJoin: Seq[(String, String)], lo: Long, hi: Long,
      txidCol: String = TransactionId): DataFrame = {
    val windowed = windowFilter(changeFeed, txidCol, lo, hi)
    val latest = latestPerKey(windowed, keyJoin.map(_._1), txidCol)
    foldChanges(latest, master, keyJoin, txidCol)
  }

  /** Initial-load envelope: `'I' AS _change_type, NULL AS _transactionid,
    * <projection> [WHERE residual]` (`S4HanaTableMapping.java:740-761`).
    * Partition parallelism is native to the Spark scan (the reference's
    * 10-way pool, `S4HanaProducer.java:534-572`, is the task scheduler here).
    */
  def initialLoad(master: DataFrame, residualWhere: Option[String] = None,
      projection: Seq[Column] = Nil): DataFrame = {
    val filtered = residualWhere.filter(_.trim.nonEmpty).fold(master)(w => master.where(expr(w)))
    val proj = if (projection.isEmpty) filtered.columns.toSeq.map(col) else projection
    filtered.select(
      lit(Insert).alias(ChangeType) +:
      lit(null).cast(LongType).alias(TransactionId) +:
      proj: _*)
  }

  /** PK-update handling (ST5): an update that changes a PK value must emit
    * TWO change rows — one under the old key (which will fold to DELETE when
    * the master lookup misses) and one under the new key (which folds to
    * UPSERT). Mirror of the trigger's conditional second insert
    * (`S4HanaTableMapping.java:207-215`).
    *
    * @param updates rows carrying both old and new key values
    * @param keyPairs (oldKeyCol, newKeyCol, outKeyCol) triples
    */
  def splitPkChange(updates: DataFrame, keyPairs: Seq[(String, String, String)],
      txidCol: String = TransactionId): DataFrame = {
    val changed = keyPairs.map { case (o, n, _) => col(o) =!= col(n) }.reduce(_ || _)
    val oldStruct = struct(keyPairs.map { case (o, _, out) => col(o).alias(out) }: _*)
    val newStruct = struct(keyPairs.map { case (_, n, out) => col(n).alias(out) }: _*)
    val keys = when(changed, array(oldStruct, newStruct)).otherwise(array(newStruct))
    val passThrough = updates.columns.toSeq
      .filterNot(c => keyPairs.exists(p => p._1 == c || p._2 == c))
      .map(col)
    updates
      .select(explode(keys).alias("_k") +: passThrough: _*)
      .select(keyPairs.map { case (_, _, out) => col(s"_k.$out").alias(out) } ++ passThrough: _*)
  }
}
