package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{ColumnMapping, GraftCatalog, TableMapping}

/** Cross-cutting engine tests: catalog registration lifecycle, decimal
  * fidelity (the reference's single unit test, `ConversionTest.java:24-32`),
  * and plan-shape regression guards.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("catalog lifecycle: JSON dir → registered views with expression columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bo").toFile
    TableMapping.write(dir, TableMapping(
      name = "SO.Header", mastertable = "vbak",
      columnmappings = Seq(
        ColumnMapping("VBELN", "VBELN", "NVARCHAR(10)"),
        ColumnMapping("NET_EUR", "NETWR * 2", "DECIMAL(15,2)")),
      pkcolumns = Seq("VBELN")))
    val master = Seq(("1", BigDecimal("10.50")), ("2", BigDecimal("20.25")))
      .toDF("VBELN", "NETWR")
    val views = GraftCatalog.registerFromDir(spark, dir, _ => master)
    assert(views == Seq("SO_Header")) // dots sanitized
    val got = spark.sql("SELECT NET_EUR FROM SO_Header WHERE VBELN = '2'")
      .as[BigDecimal].head()
    assert(got == BigDecimal("40.50"))
  }

  test("decimal fidelity: DECIMAL(7,4) parquet round-trip stays exact") {
    assert(graft.types.HanaTypes.toSparkType("DECIMAL(7,4)") == DecimalType(7, 4))
    val dir = java.nio.file.Files.createTempDirectory("graft-dec").toString
    val df = Seq("3.1415", "-0.0001", "999.9999")
      .toDF("s").select(col("s").cast(DecimalType(7, 4)).alias("d"))
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).select(col("d").cast(StringType))
      .as[String].collect().toSet
    assert(back == Set("3.1415", "-0.0001", "999.9999"))
  }

  test("plan guard: q1 pushes the shipdate filter into the parquet scan") {
    val plan = SparkEntry.queries("q1_pricing_agg")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), plan)
  }

  test("plan guard: q1 scan reads only the 6 needed columns of 11") {
    val plan = SparkEntry.queries("q1_pricing_agg")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_tax"))
  }

  test("plan guard: q5 broadcasts every dimension (no fact-dim shuffle)") {
    val plan = SparkEntry.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.split("BroadcastHashJoin").length >= 4, plan) // 3 dim joins
  }

  test("plan guard: semi-join stays a semi-join (no dedup-then-inner rewrite)") {
    val plan = SparkEntry.queries("q_j5_semi_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
  }

  test("plan guard: initial-load residual predicate reaches the scan") {
    val plan = SparkEntry.queries("q_s2_initial_load")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal"), plan)
  }

  test("plan guard: whole-stage codegen covers the custom-kernel pipeline") {
    // the sketch expressions are codegen'd (doGenCode), so the shingle →
    // minhash stage must sit inside a WholeStageCodegen span
    val sigs = graft.operators.Dedup.minhashSignatures(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text")
    // "*(n)" marks operators fused into a WholeStageCodegen span; under AQE
    // the markers appear once the final plan is materialized, so execute
    sigs.collect()
    val plan = sigs.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query is oracle-gated (no_oracle stays 0, r12 invariant)") {
    // r11 graduated the last rows-only gate; from then on a new query
    // without a DuckDB oracle is a coverage REGRESSION, not a default —
    // this pin forces the decision to be explicit (add the oracle, or
    // amend this test with a documented reason)
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(ungated.isEmpty, s"query without oracle: $ungated")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
