package graft.types

import org.apache.spark.sql.types._
import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class HanaTypesSpec extends AnyFunSuite {

  test("scalar type mapping") {
    assert(HanaTypes.toSparkType("TINYINT") == ShortType)
    assert(HanaTypes.toSparkType("SMALLINT") == ShortType)
    assert(HanaTypes.toSparkType("INTEGER") == IntegerType)
    assert(HanaTypes.toSparkType("BIGINT") == LongType)
    assert(HanaTypes.toSparkType("REAL") == FloatType)
    assert(HanaTypes.toSparkType("DOUBLE") == DoubleType)
    assert(HanaTypes.toSparkType("BOOLEAN") == BooleanType)
    assert(HanaTypes.toSparkType("DATE") == DateType)
    assert(HanaTypes.toSparkType("TIMESTAMP") == TimestampType)
    assert(HanaTypes.toSparkType("SECONDDATE") == TimestampType)
    // HANA TIME (hh:mm:ss, second precision) → native TIME(0), not a string
    assert(HanaTypes.toSparkType("TIME") == TimeType(0))
  }

  test("parameterized types parse NAME(len[,scale])") {
    assert(HanaTypes.toSparkType("DECIMAL(15,2)") == DecimalType(15, 2))
    assert(HanaTypes.toSparkType("DECIMAL(7, 4)") == DecimalType(7, 4))
    assert(HanaTypes.toSparkType("DECIMAL(38)") == DecimalType(38, 0))
    assert(HanaTypes.toSparkType("NVARCHAR(10)") == StringType)
    assert(HanaTypes.toSparkType("VARCHAR(256)") == StringType)
    assert(HanaTypes.toSparkType("ALPHANUM(10)") == StringType)
    assert(HanaTypes.toSparkType("VARBINARY(2000)") == BinaryType)
  }

  test("SMALLDECIMAL: exact decimal when declared, documented double otherwise (ADVICE r2)") {
    // bare SMALLDECIMAL → DoubleType: deliberate lossy divergence (scale
    // floats in -369..368; any fixed DecimalType would truncate, and the
    // reference's AvroDecimal(0,0) is degenerate here)
    assert(HanaTypes.toSparkType("SMALLDECIMAL") == DoubleType)
    // a full declared (p,s) pins the scale, like AvroDecimal(length, scale)
    assert(HanaTypes.toSparkType("SMALLDECIMAL(16,8)") == DecimalType(16, 8))
    // precision-only declaration: the reference defaults missing scale to 0
    // and still emits an EXACT decimal (S4HanaTableMapping.java:609-617,
    // :633-634) — matched, so monetary values never ride binary doubles
    assert(HanaTypes.toSparkType("SMALLDECIMAL(10)") == DecimalType(10, 0))
  }

  test("string/lob/geo mapping") {
    for (s <- Seq("CHAR", "NCHAR", "CLOB", "NCLOB", "TEXT", "SHORTTEXT"))
      assert(HanaTypes.toSparkType(s) == StringType, s)
    for (b <- Seq("BINARY", "BLOB", "BINTEXT", "ST_POINT", "ST_GEOMETRY"))
      assert(HanaTypes.toSparkType(b) == BinaryType, b)
  }

  test("unknown type fails fast like the reference") {
    assertThrows[IllegalArgumentException](HanaTypes.toSparkType("FANCYTYPE"))
    assertThrows[IllegalArgumentException](HanaTypes.toSparkType("(3)"))
  }

  test("SAP name sanitization") {
    assert(HanaTypes.sanitizeName("/BIC/FIELD") == "_BIC_FIELD")
    assert(HanaTypes.sanitizeName("HISTORY.CREATEDBY.EMPLOYEEID") ==
      "HISTORY_CREATEDBY_EMPLOYEEID")
    assert(HanaTypes.sanitizeName("MANDT") == "MANDT")
    assert(HanaTypes.sanitizeName("0FIELD") == "_0FIELD")
    assert(HanaTypes.sanitizeName("") == "_")
  }

  test("sanitized names are always legal identifiers (property)") {
    val prop = Prop.forAll { (raw: String) =>
      val s = HanaTypes.sanitizeName(raw)
      s.nonEmpty && !s.head.isDigit &&
        s.forall(c => c == '_' || (c.isLetterOrDigit && c < 128))
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("structFor: all-nullable, PK + original-name metadata") {
    val st = HanaTypes.structFor(
      Seq("MANDT" -> "NVARCHAR(3)", "VBELN" -> "NVARCHAR(10)",
        "NETWR" -> "DECIMAL(15,2)", "/BIC/X" -> "INTEGER"),
      pkColumns = Seq("MANDT", "VBELN"))
    assert(st.fields.forall(_.nullable))
    assert(st("NETWR").dataType == DecimalType(15, 2))
    assert(HanaTypes.pkColumns(st) == Seq("MANDT", "VBELN"))
    assert(st("_BIC_X").metadata.getString(HanaTypes.OriginalNameKey) == "/BIC/X")
  }
}
