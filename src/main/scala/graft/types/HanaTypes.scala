package graft.types

import org.apache.spark.sql.types._

/** HANA type-string → Spark [[DataType]] mapping plus SAP-name sanitization.
  *
  * Re-expresses the reference's HANA→Avro type switch
  * (`S4HanaTableMapping.java:603-677`, regex parse at `:604-617`) as a pure
  * Spark-native mapping, and the Avro-safe field-name encoding the reference
  * delegates to `AvroNameEncoder.encodeName` (`S4HanaProducer.java:219-220`)
  * as a Spark-identifier sanitizer that preserves the original name in field
  * metadata.
  *
  * All engine schemas are all-nullable (the reference adds every Avro field
  * as nullable, `S4HanaTableMapping.java:583`): JDBC primitive getters return
  * 0/0L for NULL so the reference re-checks `rs.wasNull()`
  * (`S4HanaProducer.java:306-312`) — Spark's Parquet/Avro readers carry
  * nullability natively, so the all-nullable StructType is the whole story.
  */
object HanaTypes {

  /** `NAME(len[,scale])` — mirrors the reference's pattern
    * `([^\(]+)(\((\d+)(\s*,\s*(\d+))?\))?` at `S4HanaTableMapping.java:604`.
    */
  private val TypePattern = """^\s*([A-Za-z_][A-Za-z_0-9 ]*?)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?\s*$""".r

  /** Original (pre-sanitization) column name metadata key. */
  val OriginalNameKey = "graft.originalName"

  /** HANA source type string metadata key. */
  val HanaTypeKey = "graft.hanaType"

  /** Primary-key marker metadata key (the reference marks PK fields in the
    * Avro schema, `S4HanaTableMapping.java:584-586`).
    */
  val PkKey = "graft.pk"

  /** Parse a HANA data-type string into the Spark type used by the engine.
    * Case labels cite `S4HanaTableMapping.java`.
    */
  def toSparkType(hanaType: String): DataType = hanaType match {
    case TypePattern(name, len, scale) =>
      val p = Option(len).map(_.toInt)
      val s = Option(scale).map(_.toInt)
      name.trim.toUpperCase match {
        case "TINYINT"  => ShortType // unsigned 8-bit 0..255 (:619) needs 16 bits
        case "SMALLINT" => ShortType // :621
        case "INTEGER" | "INT" => IntegerType // :623
        case "BIGINT"   => LongType // :625
        case "DECIMAL" | "DEC" => // :627 — 1<=p<=38 matches Spark's max
          DecimalType(p.getOrElse(38), s.getOrElse(if (p.isEmpty) 18 else 0))
        case "SMALLDECIMAL" => // :633 — 16-digit FLOATING-scale decimal
          // (scale range -369..368). The reference always emits an exact
          // AvroDecimal(length, scale) with missing scale defaulting to 0
          // (`S4HanaTableMapping.java:609-617`, `:633-634`) — matched here
          // for any declared precision so monetary values stay exact. Bare
          // `SMALLDECIMAL` (no declaration at all) is a DELIBERATE lossy
          // divergence to DoubleType: the true scale floats per value, a
          // fixed DecimalType(16, s) would truncate, and the reference's
          // own AvroDecimal(0, 0) is degenerate there.
          (p, s) match {
            case (Some(pp), Some(ss)) => DecimalType(math.min(pp, 38), ss)
            case (Some(pp), None)     => DecimalType(math.min(pp, 38), 0)
            case _                    => DoubleType
          }
        case "REAL"     => FloatType // :629
        case "DOUBLE" | "FLOAT" => DoubleType // :631
        case "CHAR" | "VARCHAR" | "ALPHANUM" => StringType // :635-637, :656
        case "NCHAR" | "NVARCHAR" => StringType // :652-655
        case "BINARY" | "VARBINARY" | "BLOB" | "BINTEXT" => BinaryType // :638-641, :650, :662
        case "DATE"     => DateType // :642
        case "TIME"     => TimeType(0) // :644 — HANA TIME is hh:mm:ss (second
          // precision, read via rs.getTime in the reference); Spark 4.1's
          // native TIME-without-time-zone type carries it losslessly
        case "TIMESTAMP" => TimestampType // :646 — µs precision matches AvroTimestampMicros
        case "SECONDDATE" => TimestampType // :666 — second precision fits µs
        case "CLOB" | "NCLOB" | "TEXT" | "SHORTTEXT" => StringType // :648, :658-665
        case "ST_POINT" | "ST_GEOMETRY" => BinaryType // :668-670 — WKB payload
        case "BOOLEAN"  => BooleanType // :672
        case other =>
          // unknown → fail fast like the reference's ConnectorRuntimeException (:674-675)
          throw new IllegalArgumentException(s"Unsupported HANA data type: $other")
      }
    case other => throw new IllegalArgumentException(s"Cannot parse HANA data type: $other")
  }

  /** Sanitize a SAP column name (e.g. `/BIC/FIELD`, `HISTORY.CREATEDBY.EMPLOYEEID`)
    * into a legal Spark identifier. Non `[A-Za-z0-9_]` characters become `_`;
    * a leading digit gets a `_` prefix; empty input becomes `_`.
    */
  def sanitizeName(raw: String): String = {
    val cleaned = raw.map(c => if (c.isLetterOrDigit && c < 128 || c == '_') c else '_')
    val nonEmpty = if (cleaned.isEmpty) "_" else cleaned
    if (nonEmpty.head.isDigit) "_" + nonEmpty else nonEmpty
  }

  /** Build the all-nullable engine schema for a mapped table.
    *
    * @param columns (columnName, hanaTypeString) in source order
    * @param pkColumns the primary-key column names (1..6, validated upstream)
    */
  def structFor(columns: Seq[(String, String)], pkColumns: Seq[String] = Nil): StructType = {
    val pkSet = pkColumns.toSet
    StructType(columns.map { case (name, hana) =>
      val clean = sanitizeName(name)
      val mb = new MetadataBuilder()
        .putString(HanaTypeKey, hana)
      if (clean != name) mb.putString(OriginalNameKey, name)
      if (pkSet.contains(name)) mb.putBoolean(PkKey, true)
      StructField(clean, toSparkType(hana), nullable = true, mb.build())
    })
  }

  /** Extract the PK column names from a schema built by [[structFor]]. */
  def pkColumns(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(PkKey) && f.metadata.getBoolean(PkKey) => f.name
    }
}
