package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-catalog operators (SURVEY.md §2.1 S7-S10, §2.3 J3): the
  * dictionary/constraint queries the reference issues against HANA system
  * tables, re-expressed over DataFrames (dictionary tables are plain tables
  * to Spark) and the Spark catalog.
  */
object MetadataCatalog {

  /** S7/J3: column list with primary-key flag — `table_columns LEFT OUTER
    * JOIN constraints ON is_primary_key='TRUE' AND schema/table/column
    * match, ORDER BY position` (`S4HanaTableMapping.java:272-301`).
    *
    * @param columns     (schema_name, table_name, column_name, data_type_name,
    *                    length, scale, position)
    * @param constraints (schema_name, table_name, column_name, is_primary_key)
    */
  def tableColumnsWithPk(columns: DataFrame, constraints: DataFrame,
      schemaName: String, tableName: String): DataFrame = {
    val c = columns.alias("c")
    val k = constraints.alias("k")
    c.join(k,
        col("k.is_primary_key") === "TRUE" &&
          col("k.schema_name") === col("c.schema_name") &&
          col("k.table_name") === col("c.table_name") &&
          col("k.column_name") === col("c.column_name"),
        "left_outer")
      .where(col("c.schema_name") === schemaName &&
        col("c.table_name") === tableName)
      .select(col("c.column_name").alias("column_name"),
        col("c.data_type_name").alias("data_type_name"),
        col("c.length").alias("length"), col("c.scale").alias("scale"),
        col("k.is_primary_key").isNotNull.alias("is_pk"),
        col("c.position").alias("position"))
      .orderBy(col("position"))
  }

  /** S8: browse candidate source tables — `DD02L ⟕ DD02T (ddlanguage='E')
    * WHERE tabclass='TRANSP' ORDER BY 1` (`S4HanaBrowse.java:85-102`).
    */
  def browseTables(dd02l: DataFrame, dd02t: DataFrame): DataFrame = {
    val t = dd02l.alias("t")
    val x = dd02t.alias("x")
    t.join(x,
        col("x.tabname") === col("t.tabname") && col("x.ddlanguage") === "E",
        "left_outer")
      .where(col("t.tabclass") === "TRANSP")
      .select(col("t.tabname").alias("tabname"),
        col("x.ddtext").alias("ddtext"))
      .orderBy(col("tabname"))
  }

  /** S8 (PK fallback): ABAP-dictionary key columns — `DD03L WHERE
    * keyflag='X' AND as4local='A' ORDER BY position`
    * (`S4HanaTableMapping.java:308-321`).
    */
  def pkFallback(dd03l: DataFrame, tableName: String): DataFrame =
    dd03l.where(col("tabname") === tableName &&
        col("keyflag") === "X" && col("as4local") === "A")
      .select(col("fieldname"), col("position"))
      .orderBy(col("position"))

  /** S9: existence probe (`S4HanaTableMapping.java:491-505`). */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** S9 (frame form): the reference's probe `select 1 from tables where
    * table_name = ? and schema_name = current_user`
    * (`S4HanaTableMapping.java:491-505`) over a tables-shaped frame — one
    * row of literal 1 when present, zero rows when not. Gated by
    * `q_s9_existence_probe`.
    */
  def existenceProbe(tables: DataFrame, schemaName: String,
      tableName: String): DataFrame =
    tables.where(col("schema_name") === schemaName &&
        col("table_name") === tableName)
      .select(lit(1).alias("one")).limit(1)

  /** S10: connection/validity probe — cheapest possible scan
    * (`S4HanaBrowse.java:154-177`).
    */
  def validate(df: DataFrame): Boolean = df.limit(1).count() >= 0

  /** S10 (frame form): the reference's validate() statement — `select top 1
    * tabname, ddtext from DD02L ⟕ DD02T (ddlanguage='E') where
    * tabclass='TRANSP' order by 1` (`S4HanaBrowse.java:154-177`); healthy
    * iff it returns a row. TakeOrderedAndProject plan — no global sort.
    * Gated by `q_s10_validation_probe`.
    */
  def validationProbe(dd02l: DataFrame, dd02t: DataFrame): DataFrame =
    browseTables(dd02l, dd02t).orderBy(col("tabname")).limit(1)
}
