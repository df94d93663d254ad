package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming-native last-write-wins dedup (A1/ST4 as a stateful streaming
  * operator): one state entry per key holding the highest transaction id
  * seen; a change row is emitted only when it advances its key's txid, so
  * replays and out-of-order duplicates are suppressed inside the stream —
  * no foreachBatch round-trip through a store.
  *
  * This is the `KeyValueGroupedDataset.flatMapGroupsWithState` form of the
  * reference's GROUP BY pk / MAX(txid) fold (`S4HanaTableMapping.java:
  * 454-461`); state expiry via processing-time timeout is the ST7
  * retention analog (PKLOG 7-day delete, `S4HanaProducer.java:474-491`).
  *
  * Scale: state is partitioned by key across executors (HDFS/RocksDB state
  * store); each micro-batch shuffles only its own rows. The timeout bounds
  * state size by churn horizon, exactly like PKLOG retention bounds the
  * change log.
  */
object StatefulDedup {

  /** One keyed change row on the wire: envelope + opaque payload. */
  case class KeyedChange(key: String, txid: Long, changeType: String, payload: String)

  /** Per-key state: highest txid seen (public — Catalyst codegen
    * instantiates it from generated code).
    */
  case class SeenTxid(txid: Long)

  /** Collapse a keyed change stream to rows that advance their key's txid.
    *
    * @param stateTtl processing-time retention for idle keys, e.g. "7 days"
    *                 (the PKLOG retention analog); empty = keep state
    *                 forever AND run timeout-free — with a TTL configured,
    *                 Structured Streaming triggers micro-batches
    *                 continuously (even with no data) to evaluate expiry,
    *                 which is correct for a long-running job but turns
    *                 test-style processAllAvailable() into a busy loop
    */
  def latestPerKey(changes: Dataset[KeyedChange],
      stateTtl: String = ""): Dataset[KeyedChange] = {
    implicit val outEnc = Encoders.product[KeyedChange]
    implicit val stateEnc = Encoders.product[SeenTxid]
    val timeoutConf =
      if (stateTtl.nonEmpty) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    changes
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[SeenTxid, KeyedChange](
        OutputMode.Update(), timeoutConf) {
        (key: String, rows: Iterator[KeyedChange], state: GroupState[SeenTxid]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.map(_.txid).getOrElse(Long.MinValue)
            // fold the batch to its own latest first (A1), then gate on state
            val latest = rows.reduceOption((a, b) => if (a.txid >= b.txid) a else b)
            val out = latest.filter(_.txid > seen)
            out.foreach(r => state.update(SeenTxid(r.txid)))
            // re-arm on EVERY invocation with live state: an invocation
            // clears the pending timeout, so arming only on emission would
            // let a trickle of stale duplicates pin state forever
            if (stateTtl.nonEmpty && state.exists)
              state.setTimeoutDuration(stateTtl)
            out.iterator
          }
      }
  }

  /** [[latestPerKey]] for FULL typed rows: the change stream keeps its
    * entire envelope + payload schema (the shape the reference's producer
    * actually publishes — one Avro record per row,
    * `S4HanaProducer.java:216-315`) instead of a pre-serialized string.
    * Keys may be composite and of any data type; the emitted rows are the
    * winning input rows, schema unchanged.
    *
    * Same state contract as the string form: one `SeenTxid` per key,
    * replays and out-of-order duplicates suppressed, optional TTL expiry.
    */
  def latestPerKeyRows(changes: DataFrame, keyCols: Seq[String],
      txidCol: String = graft.cdc.Cdc.TransactionId,
      stateTtl: String = ""): DataFrame = {
    val schema = changes.schema
    val txIdx = schema.fieldIndex(txidCol)
    val keyIdx = keyCols.map(schema.fieldIndex)
    val keySchema = StructType(keyIdx.map(schema.fields(_)))
    val keyEnc = Encoders.row(keySchema)
    val outEnc = Encoders.row(schema)
    val stateEnc = Encoders.product[SeenTxid]
    val timeoutConf =
      if (stateTtl.nonEmpty) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val ds = changes.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(keyEnc)
      .flatMapGroupsWithState[SeenTxid, Row](
        OutputMode.Update(), timeoutConf) {
        (_: Row, rows: Iterator[Row], state: GroupState[SeenTxid]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.map(_.txid).getOrElse(Long.MinValue)
            val latest = rows.reduceOption((a, b) =>
              if (a.getLong(txIdx) >= b.getLong(txIdx)) a else b)
            val out = latest.filter(_.getLong(txIdx) > seen)
            out.foreach(r => state.update(SeenTxid(r.getLong(txIdx))))
            if (stateTtl.nonEmpty && state.exists)
              state.setTimeoutDuration(stateTtl)
            out.iterator
          }
      }(stateEnc, outEnc)
    ds.toDF()
  }
}
