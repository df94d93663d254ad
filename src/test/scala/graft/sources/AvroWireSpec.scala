package graft.sources

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Avro wire format: schema derivation + binary round-trip fidelity for
  * every supported type, mirroring the reference's Avro output contract
  * (`S4HanaTableMapping.java:577-597`, `S4HanaProducer.java:216-315`).
  */
class AvroWireSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("b", BooleanType), StructField("i", IntegerType),
    StructField("l", LongType), StructField("f", FloatType),
    StructField("d", DoubleType), StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("dec", DecimalType(12, 4)),
    StructField("ts", TimestampType), StructField("dt", DateType),
    StructField("sh", ShortType)))

  private def sample = {
    val rows = Seq(
      Row(true, 42, 9999999999L, 1.5f, 2.25, "héllo wörld",
        Array[Byte](1, 2, 3), new java.math.BigDecimal("12345678.9012"),
        Timestamp.valueOf("2024-03-01 12:34:56.123456"),
        Date.valueOf("2024-03-01"), 7.toShort),
      Row(false, -1, -5L, -0.5f, -1e10, "",
        Array[Byte](), new java.math.BigDecimal("-0.0001"),
        Timestamp.valueOf("1969-12-31 23:59:59.999999"), // pre-epoch micros
        Date.valueOf("1969-01-15"), (-3).toShort),
      Row(null, null, null, null, null, null, null, null, null, null, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("round-trip is the identity for all types incl. nulls and pre-epoch") {
    val got = AvroWire.roundTrip(sample)
    assert(got.schema == schema)
    val a = sample.collect().map(_.toSeq.map(norm)).toSet
    val b = got.collect().map(_.toSeq.map(norm)).toSet
    assert(a == b)
  }

  private def norm(v: Any): Any = v match {
    case arr: Array[Byte] => arr.toSeq
    case x => x
  }

  test("derived Avro schema carries the reference's logical types") {
    val s = AvroWire.avroSchemaFor(schema).toString
    assert(s.contains("\"logicalType\":\"decimal\"") &&
      s.contains("\"precision\":12") && s.contains("\"scale\":4"), s)
    assert(s.contains("timestamp-micros"), s)
    assert(s.contains("\"logicalType\":\"date\""), s)
    // all-nullable unions, null first (S4HanaTableMapping.java:583 analog)
    assert(s.contains("[\"null\",\"boolean\"]"), s)
  }

  test("bytes decode with the plain Avro runtime (wire compatibility)") {
    import scala.jdk.CollectionConverters._
    val bytes = AvroWire.toRecords(sample.select("s", "l"))
      .collect().map(_.getAs[Array[Byte]](0))
    val avroSchema = AvroWire.avroSchemaFor(
      StructType(Seq(schema("s"), schema("l"))))
    val reader = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](avroSchema)
    val decoded = bytes.map { b =>
      val d = org.apache.avro.io.DecoderFactory.get().binaryDecoder(b, null)
      reader.read(null, d)
    }
    val strings = decoded.map(r => Option(r.get("s")).map(_.toString)).toSet
    assert(strings == Set(Some("héllo wörld"), Some(""), None))
    assert(decoded.flatMap(r => Option(r.get("l"))).map(_.asInstanceOf[Long]).toSet ==
      Set(9999999999L, -5L))
  }
}
