package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

import graft.types.HanaTypes

/** One mapped column: an arbitrary SQL expression projected under an alias.
  *
  * Mirrors the reference's column-mapping triple `{alias, sql-expression,
  * hanadatatype}` (`S4HanaTableMapping.java:683-738`; the expression is
  * usually `"L1"."COL"` but arbitrary scalar SQL is allowed, written by
  * `SourceTableService.java:67`). In the Spark engine the expression is any
  * Spark SQL expression accepted by `expr(...)`.
  */
case class ColumnMapping(alias: String, sql: String, hanadatatype: String) {
  def toColumn: Column = expr(sql).alias(alias)
}

/** A join-condition pair for a hierarchical (parent/child) relation —
  * mirrors `joincondition[{left,right}]` in the reference's nested
  * business-object JSON (`src/test/resources/tmp/…SO.Header.json`).
  */
case class JoinCondition(left: String, right: String)

/** A child relation of a hierarchical business object: the child table's
  * mapping name and the parent schema field its rows nest under.
  */
case class Relation(detail: String, schemafield: String, joincondition: Seq[JoinCondition])

/** A table mapping / "Business Object": a named projection of one master
  * table, persisted as JSON — the engine's unit of replication.
  *
  * Mirrors `S4HanaTableMapping.java:33-47` (fields) and `:73-120` (JSON
  * read/write, one file per object). PK count is validated to 1..6 like the
  * reference (`S4HanaTableMapping.java:134-139`).
  */
case class TableMapping(
    name: String,
    mastertable: String,
    alias: String = "L1",
    columnmappings: Seq[ColumnMapping] = Nil,
    pkcolumns: Seq[String] = Nil,
    initialloadwhere: Option[String] = None,
    relations: Seq[Relation] = Nil) {

  def validated: TableMapping = {
    require(pkcolumns.nonEmpty, s"Mapping $name: at least one PK column required")
    require(pkcolumns.size <= TableMapping.MaxPkColumns,
      s"Mapping $name: at most ${TableMapping.MaxPkColumns} PK columns supported, got ${pkcolumns.size}")
    require(name.nonEmpty && mastertable.nonEmpty, "name and mastertable are required")
    this
  }

  /** The projection this mapping defines, applied to the master DataFrame. */
  def project(master: DataFrame): DataFrame =
    if (columnmappings.isEmpty) master
    else master.select(columnmappings.map(_.toColumn): _*)

  /** Residual initial-load predicate (reference: `initialloadwhere`,
    * `S4HanaTableMapping.java:757-759`).
    */
  def residualFilter(df: DataFrame): DataFrame =
    initialloadwhere.filter(_.trim.nonEmpty).fold(df)(w => df.where(expr(w)))

  def toJson: String = Serialization.writePretty(this)(TableMapping.formats)
}

object TableMapping {
  /** Reference hard limit: PKLOG has PK1..PK6 (`S4HanaProducer.java:103-108`,
    * enforced at `S4HanaTableMapping.java:137-139`).
    */
  val MaxPkColumns = 6

  implicit val formats: Formats = DefaultFormats

  def fromJson(json: String): TableMapping =
    JsonMethods.parse(json).extract[TableMapping].validated

  /** Directory-of-JSON-files catalog, like the reference's `BusinessObjects/`
    * store (`S4HanaBrowse.java:28`, `48-64`; write at
    * `S4HanaTableMapping.java:95-120`).
    */
  def listMappings(dir: java.io.File): Seq[String] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json")).map(_.getName.stripSuffix(".json")).toSeq.sorted

  def read(dir: java.io.File, name: String): TableMapping =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, name + ".json").toPath), "UTF-8"))

  def write(dir: java.io.File, mapping: TableMapping): Unit = {
    dir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(dir, mapping.name + ".json").toPath,
      mapping.validated.toJson.getBytes("UTF-8"))
  }

  def delete(dir: java.io.File, name: String): Boolean =
    new java.io.File(dir, name + ".json").delete()
}
