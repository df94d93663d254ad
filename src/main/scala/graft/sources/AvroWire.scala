package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro wire format for the change stream — the reference's native output
  * encoding (it builds one Avro schema per table mapping,
  * `S4HanaTableMapping.java:577-597`, and converts JDBC rows field-by-field,
  * `S4HanaProducer.java:216-315`). The Spark analog: derive the Avro
  * schema from the DataFrame's `StructType` (all fields nullable, matching
  * `S4HanaTableMapping.java:583`) and encode/decode per partition with the
  * plain Avro runtime — binary-compatible with any Avro consumer, no
  * schema-registry dependency.
  *
  * Scale shape: serde is a `mapPartitions` over the rows — embarrassingly
  * parallel, no shuffle, writer/reader instantiated once per partition.
  */
object AvroWire {

  /** Spark → Avro schema. Logical types follow the reference's choices:
    * decimal(p,s) as bytes+decimal (AvroDecimal), timestamp as long
    * micros (AvroTimestampMicros), date as int days.
    */
  def avroSchemaFor(schema: StructType, recordName: String = "graft_record"): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroTypeFor(f.dataType)
      // all-nullable union, null first (Avro default-value convention)
      val union = Schema.createUnion(
        List(Schema.create(Schema.Type.NULL), base).asJava)
      new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    val rec = Schema.createRecord(recordName, null, "graft", false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  private def avroTypeFor(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case other =>
      throw new IllegalArgumentException(s"AvroWire: unsupported type $other")
  }

  /** Encode every row to one Avro binary record in a `value` column.
    * Schema travels as JSON text (captured by the closure, parsed once per
    * partition — Avro `Schema` itself is not serializable-stable).
    */
  def toRecords(df: DataFrame, recordName: String = "graft_record"): DataFrame = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaFor(sparkSchema, recordName).toString
    val enc = Encoders.BINARY
    df.mapPartitions { rows =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val writer = new GenericDatumWriter[GenericRecord](avroSchema)
      val out = new ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      rows.map { row =>
        out.reset()
        encoder = EncoderFactory.get().binaryEncoder(out, encoder) // reuse
        writer.write(rowToRecord(row, sparkSchema, avroSchema), encoder)
        encoder.flush()
        out.toByteArray
      }
    }(enc).toDF("value")
  }

  /** Decode a `value` binary column of Avro records back to typed rows. */
  def fromRecords(records: DataFrame, schema: StructType,
      recordName: String = "graft_record"): DataFrame = {
    val avroJson = avroSchemaFor(schema, recordName).toString
    val enc = Encoders.row(schema)
    records.select(col("value").cast(BinaryType)).mapPartitions { rows =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val reader = new GenericDatumReader[GenericRecord](avroSchema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { r =>
        decoder = DecoderFactory.get()
          .binaryDecoder(r.getAs[Array[Byte]](0), decoder) // reuse
        recordToRow(reader.read(null, decoder), schema)
      }
    }(enc)
  }

  /** Round-trip helper (tests / batch backfills): must be the identity. */
  def roundTrip(df: DataFrame): DataFrame = fromRecords(toRecords(df), df.schema)

  private def rowToRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < st.length) {
      val v =
        if (row.isNullAt(i)) null
        else st.fields(i).dataType match {
          case ByteType => row.getByte(i).toInt
          case ShortType => row.getShort(i).toInt
          case _: DecimalType =>
            ByteBuffer.wrap(row.getDecimal(i).unscaledValue().toByteArray)
          case TimestampType =>
            // java.sql.Timestamp → epoch micros (AvroTimestampMicros);
            // floorDiv so pre-1970 instants round toward -∞, not zero
            val ts = row.getTimestamp(i)
            Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
              ts.getNanos / 1000L
          case DateType => row.getDate(i).toLocalDate.toEpochDay.toInt
          case BinaryType => ByteBuffer.wrap(row.getAs[Array[Byte]](i))
          case _ => row.get(i)
        }
      rec.put(i, v)
      i += 1
    }
    rec
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row = {
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      val raw = rec.get(i)
      vals(i) =
        if (raw == null) null
        else st.fields(i).dataType match {
          case ByteType => raw.asInstanceOf[Int].toByte
          case ShortType => raw.asInstanceOf[Int].toShort
          case StringType => raw.toString // Avro Utf8 → String
          case d: DecimalType =>
            val bb = raw.asInstanceOf[ByteBuffer]
            val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
            new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
          case TimestampType =>
            val micros = raw.asInstanceOf[Long]
            val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
            ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
            ts
          case DateType =>
            java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay(raw.asInstanceOf[Int].toLong))
          case BinaryType =>
            val bb = raw.asInstanceOf[ByteBuffer]
            val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
            bytes
          case _ => raw
        }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(vals, st)
  }
}
