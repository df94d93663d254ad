package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.{ColumnMapping, TableMapping}
import graft.cdc.Cdc

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S7/J3: column metadata join flags PKs, ordered by position") {
    val columns = Seq(
      ("S", "VBAK", "MANDT", "NVARCHAR", 3, 0, 1),
      ("S", "VBAK", "VBELN", "NVARCHAR", 10, 0, 2),
      ("S", "VBAK", "NETWR", "DECIMAL", 15, 2, 3),
      ("S", "OTHER", "X", "INTEGER", 10, 0, 1)
    ).toDF("schema_name", "table_name", "column_name", "data_type_name",
      "length", "scale", "position")
    val constraints = Seq(
      ("S", "VBAK", "MANDT", "TRUE"), ("S", "VBAK", "VBELN", "TRUE")
    ).toDF("schema_name", "table_name", "column_name", "is_primary_key")
    val got = MetadataCatalog.tableColumnsWithPk(columns, constraints, "S", "VBAK")
      .select("column_name", "is_pk").as[(String, Boolean)].collect().toSeq
    assert(got == Seq(("MANDT", true), ("VBELN", true), ("NETWR", false)))
  }

  test("S8: dictionary browse filters TRANSP and joins English text") {
    val dd02l = Seq(("VBAK", "TRANSP"), ("VVIEW", "VIEW"), ("AUFK", "TRANSP"))
      .toDF("tabname", "tabclass")
    val dd02t = Seq(("VBAK", "E", "Sales Document Header"),
      ("VBAK", "D", "Verkaufsbeleg"), ("AUFK", "E", "Order master"))
      .toDF("tabname", "ddlanguage", "ddtext")
    val got = MetadataCatalog.browseTables(dd02l, dd02t)
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("AUFK", "Order master"), ("VBAK", "Sales Document Header")))
  }

  test("S8: DD03L PK fallback ordered by position") {
    val dd03l = Seq(
      ("VBAK", "VBELN", "X", "A", 2), ("VBAK", "MANDT", "X", "A", 1),
      ("VBAK", "NETWR", "", "A", 3), ("VBAK", "OLD", "X", "N", 0)
    ).toDF("tabname", "fieldname", "keyflag", "as4local", "position")
    val got = MetadataCatalog.pkFallback(dd03l, "VBAK")
      .select("fieldname").as[String].collect().toSeq
    assert(got == Seq("MANDT", "VBELN"))
  }

  test("S9/S10: existence + validity probes") {
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("probe_table")
    assert(MetadataCatalog.tableExists(spark, "probe_table"))
    assert(!MetadataCatalog.tableExists(spark, "no_such_table"))
    assert(MetadataCatalog.validate(spark.table("probe_table")))
  }

  test("S1: JDBC options push the mapping's projection and residual down") {
    val m = TableMapping("SO", "SCHEMA.VBAK", "L1",
      Seq(ColumnMapping("MANDT", """"L1"."MANDT"""", "NVARCHAR(3)"),
        ColumnMapping("NET2", "NETWR * 2", "DECIMAL(15,2)")),
      Seq("MANDT"), Some("MANDT = '800'"))
    val opts = JdbcSource.options("jdbc:sap://h:39015", "u", "p", m,
      Some(JdbcSource.Partitioning("ROWID", 0, 1000000)))
    assert(opts("dbtable") ==
      """(SELECT "L1"."MANDT" AS "MANDT", NETWR * 2 AS "NET2" FROM SCHEMA.VBAK WHERE MANDT = '800') AS L1""")
    assert(opts("numPartitions") == "10") // the reference's pool size
    assert(opts("partitionColumn") == "ROWID")
  }

  test("S3/S4: physical-partition clause scan (PARTITION (n) + m_cs_partitions)") {
    val m = TableMapping("SO", "SCHEMA.VBAK", "L1",
      Seq(ColumnMapping("MANDT", """"L1"."MANDT"""", "NVARCHAR(3)")),
      Seq("MANDT"), Some("MANDT = '800'"))
    // the reference's exact probe text (S4HanaProducer.java:511): column is
    // `partition`, and unpartitioned tables report 0/NULL rows (ADVICE r6)
    assert(JdbcSource.partitionDiscoverySql("SCHEMA", "VBAK") ==
      "select partition from m_cs_partitions " +
        "where schema_name = 'SCHEMA' and table_name = 'VBAK'")
    val tbls = JdbcSource.partitionedTables(m, Seq(1, 2, 3))
    assert(tbls.size == 3)
    assert(tbls(1) ==
      """(SELECT "L1"."MANDT" AS "MANDT" FROM SCHEMA.VBAK PARTITION (2) WHERE MANDT = '800') AS L1""")
    // part id 0 = unpartitioned table → plain scan, no PARTITION clause
    assert(JdbcSource.partitionedTables(m, Seq(0)).head ==
      """(SELECT "L1"."MANDT" AS "MANDT" FROM SCHEMA.VBAK WHERE MANDT = '800') AS L1""")
    assertThrows[IllegalArgumentException](JdbcSource.partitionedTables(m, Nil))
  }

  test("S3: partitionTasks maps 0/NULL/no-rows to one plain scan (ref :516-533)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    def frame(vals: Seq[Option[Int]]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vals.map(v => Row(v.map(Int.box).orNull)), 1),
      StructType(Seq(StructField("partition", IntegerType))))
    // hash-partitioned table: one task per physical part
    assert(JdbcSource.partitionTasks(frame(Seq(Some(1), Some(2), Some(3))))
      == Seq(1, 2, 3))
    // single row partition=0 and NULL both mean "unpartitioned"
    assert(JdbcSource.partitionTasks(frame(Seq(Some(0)))) == Seq(0))
    assert(JdbcSource.partitionTasks(frame(Seq(None))) == Seq(0))
    // no rows at all → still one full-table task
    assert(JdbcSource.partitionTasks(frame(Nil)) == Seq(0))
    // duplicate rows (per-host rows on scale-out HANA) must NOT become
    // duplicate PARTITION(n) scans — that would double the partition's rows
    assert(JdbcSource.partitionTasks(frame(Seq(Some(1), Some(1), Some(2))))
      == Seq(1, 2))
  }

  test("S4: union of hash-partition scans covers each row exactly once") {
    val df = (1L to 100L).toDF("k")
    val unioned = JdbcSource.unionPartitionScans(df, col("k"), 4)
    assert(unioned.select("k").as[Long].collect().sorted.toSeq ==
      (1L to 100L))
  }

  test("S5: Kafka record serde round-trips envelope + payload; key is PK") {
    val folded = Seq(
      (Cdc.Upsert, 7L, 1L, "800", "alice"),
      (Cdc.Delete, 8L, 2L, "800", null.asInstanceOf[String])
    ).toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "mandt", "name")
    val records = KafkaIO.toRecords(folded, Seq("mandt", "id"))
    assert(records.columns.toSeq == Seq("key", "value"))
    assert(records.select("key").as[String].collect().toSet ==
      Set("800|1", "800|2"))
    val back = KafkaIO.roundTrip(folded, Seq("mandt", "id"))
    // all-nullable on the way back — the engine's schema policy (§1.2)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      folded.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().map(_.toSeq).toSet == folded.collect().map(_.toSeq).toSet)
  }
}
