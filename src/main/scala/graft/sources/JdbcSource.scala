package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

import graft.catalog.TableMapping

/** S1-S4: the JDBC batch-source shim for initial loads straight from the
  * source database (`S4HanaConnectorFactory.java:49-66`; partitioned load
  * `S4HanaProducer.java:511-654`).
  *
  * The reference hand-rolls a 10-way partition pool with one connection per
  * partition and fail-fast abort; Spark's JDBC source provides exactly that
  * via partitionColumn/numPartitions (each partition = one task = one
  * connection, job aborts on first failure). This module only assembles the
  * reader options — untestable without a live database, but the option
  * contract is unit-tested.
  */
object JdbcSource {

  case class Partitioning(column: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int = 10) // 10 = the reference's initial-load pool size

  def options(url: String, user: String, password: String,
      mapping: TableMapping, partitioning: Option[Partitioning] = None)
      : Map[String, String] = {
    val base = Map(
      "url" -> url,
      "user" -> user,
      "password" -> password,
      // pushdown: the mapping's projection+residual runs IN the database,
      // like the reference's generated initial select
      "dbtable" -> dbtable(mapping),
      "fetchsize" -> "10000")
    partitioning.fold(base)(p => base ++ Map(
      "partitionColumn" -> p.column,
      "lowerBound" -> p.lowerBound.toString,
      "upperBound" -> p.upperBound.toString,
      "numPartitions" -> p.numPartitions.toString))
  }

  /** The pushed-down initial select (`S4HanaTableMapping.java:740-761`
    * without the envelope — Spark adds that via [[graft.cdc.Cdc.initialLoad]]).
    */
  def dbtable(mapping: TableMapping): String = {
    val proj =
      if (mapping.columnmappings.isEmpty) "*"
      else mapping.columnmappings
        .map(cm => s"""${cm.sql} AS "${cm.alias}"""").mkString(", ")
    val where = mapping.initialloadwhere.filter(_.trim.nonEmpty)
      .map(w => s" WHERE $w").getOrElse("")
    s"(SELECT $proj FROM ${mapping.mastertable}$where) AS ${mapping.alias}"
  }

  def read(spark: SparkSession, opts: Map[String, String]): DataFrame =
    opts.foldLeft(spark.read.format("jdbc")) {
      case (r: DataFrameReader, (k, v)) => r.option(k, v)
    }.load()

  // ── HANA physical-partition addressing (S3/S4) ────────────────────────────
  // The reference discovers a column table's physical partitions from
  // m_cs_partitions and scans each with an explicit `PARTITION (n)` clause,
  // one pooled connection per partition (`S4HanaProducer.java:511-533`,
  // `S4HanaTableMapping.java:751-755`) — partition-aligned parallelism
  // without inventing a numeric split column.

  /** The partition-discovery SQL (the m_cs_partitions probe). Run it over
    * JDBC (or a dictionary-shaped frame in tests) to get the part ids fed
    * to [[partitionedTables]].
    */
  def partitionDiscoverySql(schema: String, table: String): String =
    "SELECT DISTINCT PART_ID FROM M_CS_PARTITIONS " +
      s"WHERE SCHEMA_NAME = '$schema' AND TABLE_NAME = '$table' ORDER BY PART_ID"

  /** One pushed-down select per PHYSICAL partition: the initial select with
    * `PARTITION (n)` appended to the master table (the reference's
    * per-partition scan text, `S4HanaTableMapping.java:740-761` + `:751-755`).
    * part id 0 means "the table is unpartitioned" → plain scan.
    */
  def partitionedTables(mapping: TableMapping, partIds: Seq[Int]): Seq[String] = {
    require(partIds.nonEmpty, "at least one physical partition")
    partIds.map { id =>
      val from =
        if (id <= 0) mapping.mastertable
        else s"${mapping.mastertable} PARTITION ($id)"
      val proj =
        if (mapping.columnmappings.isEmpty) "*"
        else mapping.columnmappings
          .map(cm => s"""${cm.sql} AS "${cm.alias}"""").mkString(", ")
      val where = mapping.initialloadwhere.filter(_.trim.nonEmpty)
        .map(w => s" WHERE $w").getOrElse("")
      s"(SELECT $proj FROM $from$where) AS ${mapping.alias}"
    }
  }

  /** Read every physical partition in parallel and union the scans — each
    * partition select is one Spark task/connection, exactly the reference's
    * partition pool, with Spark's scheduler as the pool.
    */
  def readPartitioned(spark: SparkSession, url: String, user: String,
      password: String, mapping: TableMapping, partIds: Seq[Int]): DataFrame =
    partitionedTables(mapping, partIds)
      .map(tbl => read(spark, Map(
        "url" -> url, "user" -> user, "password" -> password,
        "dbtable" -> tbl, "fetchsize" -> "10000")))
      .reduce(_ unionAll _)
}
