package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cdc.Cdc

/** S5/S6: Kafka sink/source wiring for the change-record stream.
  *
  * The reference publishes Avro records inside Kafka transactions
  * (`S4HanaProducer.java:424-449`) with one topic per producer. The Spark
  * engine's contract: envelope + payload serialized per record; streaming
  * writes are exactly-once per sink epoch via checkpointing. Serialization
  * here is JSON (`to_json`/`from_json` — codegen'd, schema-checked); an
  * Avro serializer slots into the same two functions where a schema
  * registry is available.
  *
  * No broker exists in this environment, so the option builders and the
  * record serde are the tested surface; `readStream`/`writeStream` plumbing
  * is standard Spark.
  */
object KafkaIO {

  /** Serialize folded change rows to (key, value) Kafka records: key = the
    * concatenated PK (partition affinity per key → per-key ordering), value
    * = JSON of envelope + payload.
    */
  def toRecords(folded: DataFrame, pkCols: Seq[String]): DataFrame =
    folded.select(
      concat_ws("|", pkCols.map(c => col(c).cast("string")): _*).alias("key"),
      to_json(struct(folded.columns.map(col): _*)).alias("value"))

  /** Parse Kafka records back into typed change rows. */
  def fromRecords(records: DataFrame, schema: StructType): DataFrame =
    records.select(from_json(col("value").cast("string"), schema).alias("_r"))
      .select(col("_r.*"))

  /** writeStream options for the transactional sink (checkpoint = the
    * reference's transaction/offset store).
    */
  def sinkOptions(bootstrap: String, topic: String, checkpointDir: String)
      : Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> topic,
    "checkpointLocation" -> checkpointDir)

  /** readStream options for the consumer side. */
  def sourceOptions(bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets,
    "failOnDataLoss" -> "true")

  /** Round-trip helper for tests and batch backfills: records → rows with
    * the same schema/values as the input to [[toRecords]].
    */
  def roundTrip(folded: DataFrame, pkCols: Seq[String]): DataFrame =
    fromRecords(toRecords(folded, pkCols), folded.schema)
}
