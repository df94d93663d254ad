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

  /** The partition-discovery SQL — the reference's exact m_cs_partitions
    * probe text (`S4HanaProducer.java:511`), with the bind markers filled:
    * unquoted `partition` resolves to HANA's PARTITION column. Run it over
    * JDBC (or an m_cs_partitions-shaped frame: `q_s3_partition_discovery`)
    * and feed the result to [[partitionTasks]].
    */
  def partitionDiscoverySql(schema: String, table: String): String =
    "select partition from m_cs_partitions " +
      s"where schema_name = '$schema' and table_name = '$table'"

  /** The reference's row→task mapping (`S4HanaProducer.java:516-533`):
    * m_cs_partitions has either one row with partition 0 (or NULL — JDBC
    * getInt reads both as 0) for an unpartitioned table, or rows 1..n for a
    * hash-partitioned one; no rows at all also means one plain scan. 0/NULL
    * → a single full-table task (id 0); 1..n → one task per physical part.
    * Part ids are DEDUPLICATED (first-seen order): a view returning one row
    * per host per partition (scale-out HANA) would otherwise yield two
    * `PARTITION (n)` scans and silently double that partition's rows — the
    * reference would create duplicate InitialLoadTasks here, a bug not
    * worth reproducing. The collect is bounded by the table's physical
    * partition count (a few hundred at most on any real system).
    */
  def partitionTasks(discovered: DataFrame): Seq[Int] = {
    val ids = discovered.collect().toSeq
      .map(r => if (r.isNullAt(0)) 0 else r.get(0).asInstanceOf[Number].intValue)
      .distinct
    if (ids.isEmpty) Seq(0) else ids
  }

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

  /** The [[readPartitioned]] plan shape over an already-loaded frame: one
    * scan per physical partition (membership by key hash — HANA's default
    * HASH partitioning), unioned. Gates the S4 invariant that the union of
    * per-partition scans is exactly the plain scan
    * (`q_s4_partition_union`) without a live database; each branch maps to
    * one `PARTITION (n)` select/connection in the JDBC path.
    */
  def unionPartitionScans(df: DataFrame,
      partKey: org.apache.spark.sql.Column, parts: Int): DataFrame = {
    require(parts > 0, "at least one physical partition")
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    (0 until parts)
      .map(i => df.where(pmod(hash(partKey), lit(parts)) === i))
      .reduce(_ unionAll _)
  }
}
