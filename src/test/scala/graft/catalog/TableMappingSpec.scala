package graft.catalog

import graft.SparkSpec

class TableMappingSpec extends SparkSpec {
  import spark.implicits._

  private val mapping = TableMapping(
    name = "SalesOrderHeader",
    mastertable = "VBAK",
    alias = "L1",
    columnmappings = Seq(
      ColumnMapping("MANDT", "MANDT", "NVARCHAR(3)"),
      ColumnMapping("VBELN", "VBELN", "NVARCHAR(10)"),
      ColumnMapping("NETWR_X2", "NETWR * 2", "DECIMAL(15,2)")),
    pkcolumns = Seq("MANDT", "VBELN"),
    initialloadwhere = Some("MANDT = '800'"),
    relations = Seq(Relation("SO.Item", "items",
      Seq(JoinCondition("SALESORDERID", "SALESORDERID")))))

  test("JSON round-trip preserves every field") {
    val back = TableMapping.fromJson(mapping.toJson)
    assert(back == mapping)
  }

  test("PK count validation: 1..6 like the reference") {
    assertThrows[IllegalArgumentException](
      mapping.copy(pkcolumns = Nil).validated)
    assertThrows[IllegalArgumentException](
      mapping.copy(pkcolumns = (1 to 7).map("PK" + _)).validated)
  }

  test("file store: write/list/read/delete") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cat").toFile
    TableMapping.write(dir, mapping)
    assert(TableMapping.listMappings(dir) == Seq("SalesOrderHeader"))
    assert(TableMapping.read(dir, "SalesOrderHeader") == mapping)
    assert(TableMapping.delete(dir, "SalesOrderHeader"))
    assert(TableMapping.listMappings(dir).isEmpty)
  }

  test("projection applies arbitrary SQL expressions with aliases") {
    val df = Seq(("800", "1", BigDecimal(10))).toDF("MANDT", "VBELN", "NETWR")
    val got = mapping.project(df)
    assert(got.columns.toSeq == Seq("MANDT", "VBELN", "NETWR_X2"))
    assert(got.select("NETWR_X2").as[BigDecimal].head() == BigDecimal(20))
  }

  test("residual filter applies initialloadwhere") {
    val df = Seq(("800", "1", BigDecimal(1)), ("900", "2", BigDecimal(2)))
      .toDF("MANDT", "VBELN", "NETWR")
    assert(mapping.residualFilter(df).count() == 1)
  }
}
