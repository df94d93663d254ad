package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guards against the one window shape that cannot scale: a Window operator
  * with an EMPTY partitionSpec funnels every row of its input through a
  * single task's sort (VERDICT r6 finding #2). Every windowed query in
  * SparkEntry must either partition its window or avoid the Window operator
  * entirely (TakeOrderedAndProject / max-equality rewrites).
  */
class WindowGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Fails if the optimized plan contains a global (unpartitioned) Window. */
  def assertNoGlobalWindow(df: DataFrame): Unit = {
    val global = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"unpartitioned Window (single-task sort at scale):\n${global.mkString("\n")}")
  }

  private val windowedQueries = Seq(
    "q_w1_rank_top1", "q_w2_top1_orderby", "q_w4_window_funcs",
    "q_w5_topk_per_group", "q_window_tumbling_agg", "q_window_session",
    "q_sample_quota",
    // r9: sketch-CDF compositions window per-group over BINS, never rows
    "q_quality_gate", "q_corpus_card", "q_quantile_sketch")

  test("no headline window query plans a global single-partition Window") {
    windowedQueries.foreach { name =>
      assertNoGlobalWindow(SparkEntry.queries(name)(spark, sf))
    }
  }

  test("q_w1 max-equality rewrite is tie-exact vs rank()===1") {
    import spark.implicits._
    // ties at the max key must all survive, exactly as rank()===1 keeps them
    val df = Seq((5, "a"), (9, "b"), (9, "c"), (3, "d"), (9, "e"))
      .toDF("k", "v")
    val ranked = df
      .withColumn("rnk", rank().over(Window.orderBy(col("k").desc)))
      .where(col("rnk") === 1).select("k", "v")
    val mx = df.agg(max(col("k")).alias("max_k"))
    val rewritten = df.join(broadcast(mx), col("k") === col("max_k"))
      .select("k", "v")
    assert(rewritten.collect().toSet === ranked.collect().toSet)
    assert(rewritten.count() === 3)
  }

  test("q_w1 at sf0.001 matches the rank-based oracle rows") {
    val got = SparkEntry.queries("q_w1_rank_top1")(spark, sf)
    val orders = Tables.load(spark, sf, "orders")
    val oracle = orders
      .withColumn("rnk", rank().over(Window.orderBy(col("o_orderkey").desc)))
      .where(col("rnk") === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    assert(got.collect().toSet === oracle.collect().toSet)
    assert(got.count() >= 1)
  }
}
