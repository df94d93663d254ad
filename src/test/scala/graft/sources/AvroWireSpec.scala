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

  test("TIME column round-trips on the wire as Avro time-micros (ADVICE r6)") {
    // HANA TIME maps to native TimeType since r6; the wire must carry it
    // (the reference ships TIME as AvroTime, S4HanaTableMapping.java:644-645).
    // Spark's Row encoder normalizes TIME to micros precision, so the frame
    // carries TimeType(6); time-micros loses nothing at any precision.
    val tSchema = StructType(Seq(
      StructField("id", IntegerType), StructField("t", TimeType(6))))
    val rows = Seq(
      Row(1, java.time.LocalTime.of(12, 34, 56)),
      Row(2, java.time.LocalTime.of(0, 0, 0)),
      Row(3, java.time.LocalTime.of(23, 59, 59)),
      Row(4, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), tSchema)
    val got = AvroWire.roundTrip(df)
    assert(got.schema == tSchema)
    assert(got.collect().map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
    assert(AvroWire.avroSchemaFor(tSchema).toString.contains("time-micros"))
    // the catalog-facing TimeType(0) derives the same wire type
    assert(AvroWire.avroSchemaFor(StructType(Seq(StructField("t", TimeType(0)))))
      .toString.contains("time-micros"))
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

  // ── Nested records/arrays: the hierarchical business-object wire shape
  //    (S4HanaTableMapping.java:577-597; nested `relations` fixture
  //    …SO.Header.json) ────────────────────────────────────────────────────
  private val nestedSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("hdr", StructType(Seq(
      StructField("name", StringType), StructField("qty", IntegerType)))),
    StructField("items", ArrayType(StructType(Seq(
      StructField("line", IntegerType), StructField("amt", DecimalType(10, 2)),
      StructField("tags", ArrayType(StringType))))))))

  private def nestedSample = {
    val rows = Seq(
      Row(1L, Row("so-1", 3), Seq(
        Row(1, new java.math.BigDecimal("10.50"), Seq("a", "b")),
        Row(2, new java.math.BigDecimal("-0.25"), Seq.empty[String]))),
      Row(2L, Row(null, null), Seq.empty[Row]), // empty child array survives
      Row(3L, null, null)) // null struct and null array survive
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), nestedSchema)
  }

  test("nested record/array round-trip is the identity") {
    val got = AvroWire.roundTrip(nestedSample)
    assert(got.schema == nestedSchema)
    val a = nestedSample.collect().map(_.toSeq.map(norm)).toSet
    val b = got.collect().map(_.toSeq.map(norm)).toSet
    assert(a == b)
  }

  test("string-keyed map round-trip (Avro map)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("props", MapType(StringType, StringType))))
    val rows = Seq(
      Row(1L, Map("a" -> "x", "b" -> null)),
      Row(2L, Map.empty[String, String]),
      Row(3L, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = AvroWire.roundTrip(df)
    assert(got.schema == schema)
    assert(got.collect().map(r => (r.getLong(0), r.getMap[String, String](1))).toSet ==
      Set((1L, Map("a" -> "x", "b" -> null)), (2L, Map.empty), (3L, null)))
  }

  test("nested schema names records by field path (Avro name uniqueness)") {
    val s = AvroWire.avroSchemaFor(nestedSchema, "so").toString
    assert(s.contains("\"name\":\"so_hdr\""), s)
    assert(s.contains("\"name\":\"so_items_item\""), s)
    assert(s.contains("\"type\":\"array\""), s)
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

  test("schema evolution: add/drop/reorder resolve; renames need an alias") {
    val writerSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("bal", DoubleType)))
    val rows = Seq(Row(1L, "ada", 10.5), Row(2L, "bob", null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), writerSchema)
    val wire = AvroWire.toRecords(df)

    // reader adds a column (null default), drops one, and reorders
    val evolved = StructType(Seq(
      StructField("name", StringType), StructField("tag", StringType),
      StructField("id", LongType)))
    val got = AvroWire.fromRecordsEvolved(wire, writerSchema, evolved)
      .collect().map(r => (r.getAs[String]("name"),
        Option(r.getAs[String]("tag")), r.getLong(2))).toSet
    assert(got === Set(("ada", None, 1L), ("bob", None, 2L)))

    // rename WITHOUT an alias silently nulls (Avro drop+add) — the
    // documented trap; WITH the alias the old bytes flow through
    val renamed = StructType(Seq(
      StructField("id", LongType), StructField("customer_name", StringType)))
    val unaliased = AvroWire.fromRecordsEvolved(wire, writerSchema, renamed)
      .collect().map(r => Option(r.getAs[String]("customer_name"))).toSet
    assert(unaliased === Set(None))
    val aliased = AvroWire.fromRecordsEvolved(wire, writerSchema, renamed,
        readerAliases = Map("customer_name" -> "name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(aliased === Set((1L, "ada"), (2L, "bob")))

    // alias naming a column absent from the reader schema fails loudly
    intercept[IllegalArgumentException] {
      AvroWire.fromRecordsEvolved(wire, writerSchema, renamed,
        readerAliases = Map("nope" -> "name"))
    }
  }
}
