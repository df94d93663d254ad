package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the delta-join identity: maintaining the view under a folded
  * batch equals re-materializing from the current replicas — across
  * upserts, deletes, join-key changes, PK-change double records, and
  * changes on both sides at once. Also pins the scale claim: the
  * maintenance plan is shuffle-free (broadcast joins only).
  */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  // orders(o_id PK, o_cust join key, o_amt) ⋈ customers(c_id, c_seg)
  private val oldOrders = Seq(
    (1L, 10L, 100.0), (2L, 10L, 200.0), (3L, 20L, 300.0),
    (4L, 30L, 400.0), (5L, 40L, 500.0)
  ).toDF("o_id", "o_cust", "o_amt")
  private val oldCust = Seq(
    (10L, "A"), (20L, "B"), (30L, "C"), (40L, "D")
  ).toDF("c_id", "c_seg")

  private def sortedRows(df: DataFrame) =
    df.orderBy("o_id").collect().toSeq

  private def check(newOrders: DataFrame, newCust: DataFrame,
      touchedPks: DataFrame, touchedKeys: DataFrame): Unit = {
    val oldView = IncrementalJoin.joinView(oldOrders, oldCust, "o_cust", "c_id")
    val maintained = IncrementalJoin.maintainJoinView(oldView, newOrders,
      newCust, touchedPks, touchedKeys, "o_id", "o_cust", "c_id")
    val recomputed = IncrementalJoin.joinView(newOrders, newCust, "o_cust", "c_id")
    assert(maintained.columns.toSeq == recomputed.columns.toSeq)
    assert(sortedRows(maintained) == sortedRows(recomputed))
  }

  test("left upsert (amount change) refreshes exactly its row") {
    val newOrders = oldOrders.withColumn("o_amt",
      when($"o_id" === 2L, 250.0).otherwise($"o_amt"))
    check(newOrders, oldCust, Seq(2L).toDF("k"), spark.emptyDataset[Long].toDF("k"))
  }

  test("left delete removes its view row") {
    check(oldOrders.where($"o_id" =!= 3L), oldCust,
      Seq(3L).toDF("k"), spark.emptyDataset[Long].toDF("k"))
  }

  test("left join-key change re-points the row (PK listed once)") {
    val newOrders = oldOrders.withColumn("o_cust",
      when($"o_id" === 4L, 10L).otherwise($"o_cust"))
    check(newOrders, oldCust, Seq(4L).toDF("k"), spark.emptyDataset[Long].toDF("k"))
  }

  test("right upsert fans out to every joined left row") {
    val newCust = oldCust.withColumn("c_seg",
      when($"c_id" === 10L, "A2").otherwise($"c_seg"))
    check(oldOrders, newCust, spark.emptyDataset[Long].toDF("k"), Seq(10L).toDF("k"))
  }

  test("right delete drops all its joined rows") {
    check(oldOrders, oldCust.where($"c_id" =!= 10L),
      spark.emptyDataset[Long].toDF("k"), Seq(10L).toDF("k"))
  }

  test("right PK change arrives as double record: both images touched") {
    // customer 20 renamed to 25: delete(20) + insert(25); order 3 follows
    val newCust = oldCust.withColumn("c_id",
      when($"c_id" === 20L, 25L).otherwise($"c_id"))
    val newOrders = oldOrders.withColumn("o_cust",
      when($"o_id" === 3L, 25L).otherwise($"o_cust"))
    check(newOrders, newCust, Seq(3L).toDF("k"), Seq(20L, 25L).toDF("k"))
  }

  test("both sides change in one batch, including an overlapping row") {
    val newOrders = oldOrders.where($"o_id" =!= 5L).withColumn("o_amt",
      when($"o_id" === 1L, 150.0).otherwise($"o_amt"))
    val newCust = oldCust.where($"c_id" =!= 30L).withColumn("c_seg",
      when($"c_id" === 10L, "A2").otherwise($"c_seg"))
    check(newOrders, newCust, Seq(1L, 5L).toDF("k"), Seq(10L, 30L).toDF("k"))
  }

  test("empty batch is the identity") {
    check(oldOrders, oldCust,
      spark.emptyDataset[Long].toDF("k"), spark.emptyDataset[Long].toDF("k"))
  }

  test("duplicate touched keys (at-least-once feed) do not duplicate rows") {
    val newOrders = oldOrders.withColumn("o_amt",
      when($"o_id" === 2L, 250.0).otherwise($"o_amt"))
    check(newOrders, oldCust, Seq(2L, 2L, 2L).toDF("k"), Seq(10L, 10L).toDF("k"))
  }

  test("maintenance plan is shuffle-free: broadcast joins, no exchange") {
    val oldView = IncrementalJoin.joinView(oldOrders, oldCust, "o_cust", "c_id")
    val maintained = IncrementalJoin.maintainJoinView(oldView, oldOrders,
      oldCust, Seq(2L).toDF("k"), Seq(10L).toDF("k"), "o_id", "o_cust", "c_id")
    val plan = maintained.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"view/right side shuffled:\n$plan")
    assert(!plan.contains("ShuffledHashJoin"), s"view/right side shuffled:\n$plan")
  }
}
