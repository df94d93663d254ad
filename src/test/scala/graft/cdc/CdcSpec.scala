package graft.cdc

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Hand-computed CDC semantics: last-write-wins fold, delete detection,
  * PK-change double-record, change-view rename (SURVEY.md §7.1 slice).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // change log: (key, txid) — key 1 changed twice, key 2 once, key 99 once
  // (no master row → delete), key 3 changed outside the window.
  private lazy val changes = Seq(
    (1L, 101L), (1L, 105L), (2L, 103L), (99L, 104L), (3L, 200L)
  ).toDF("id", "_transactionid")

  private lazy val master = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)
  ).toDF("id", "name", "score")

  test("windowFilter keeps (lo, hi] only") {
    val got = Cdc.windowFilter(changes, "_transactionid", 101L, 199L)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 99L)) // txid 101 excluded (lo is exclusive)
  }

  test("latestPerKey collapses to max txid per key") {
    val got = Cdc.latestPerKey(
      Cdc.windowFilter(changes, "_transactionid", 100L, 199L), Seq("id"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 105L, 2L -> 103L, 99L -> 104L))
  }

  test("delta fold: upsert vs delete, PK carried on delete, last-write-wins") {
    val got = Cdc.delta(changes, master, Seq(("id", "id")), lo = 100L, hi = 199L)
      .collect().map(r => (r.getLong(2), (r.getString(0), r.getLong(1),
        Option(r.get(3)), Option(r.get(4))))).toMap
    // key 1: two changes fold to one UPSERT at txid 105 with master values
    assert(got(1L) == (("A", 105L, Some("alice"), Some(10.0))))
    assert(got(2L) == (("A", 103L, Some("bob"), Some(20.0))))
    // key 99: no master row → DELETE, key present, non-key columns null
    assert(got(99L) == (("D", 104L, None, None)))
    // key 3 changed at txid 200 — outside window
    assert(!got.contains(3L))
  }

  test("initialLoad: 'I' envelope, null txid, residual where") {
    val got = Cdc.initialLoad(master, Some("score > 15")).collect()
    assert(got.length == 2)
    assert(got.forall(r => r.getString(0) == "I" && r.isNullAt(1)))
    assert(got.map(_.getLong(2)).sorted.toSeq == Seq(2L, 3L))
  }

  test("splitPkChange: PK update emits old+new key rows, others one row") {
    val updates = Seq(
      (10L, 10L, 500L),  // PK unchanged → 1 row
      (20L, 21L, 501L)   // PK changed → 2 rows (old 20 + new 21)
    ).toDF("old_pk", "new_pk", "_transactionid")
    val got = Cdc.splitPkChange(updates, Seq(("old_pk", "new_pk", "pk")))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 500L), (20L, 501L), (21L, 501L)))
  }

  test("pk-change old key folds to DELETE, new key to UPSERT end-to-end") {
    // master has row 21 (the post-update state); old key 20 is gone
    val m = Seq((10L, "x"), (21L, "y")).toDF("id", "v")
    val updates = Seq((20L, 21L, 501L)).toDF("old_pk", "new_pk", "_transactionid")
    val feed = Cdc.splitPkChange(updates, Seq(("old_pk", "new_pk", "id")))
    val got = Cdc.delta(feed, m, Seq(("id", "id")), lo = 0L, hi = 1000L)
      .collect().map(r => r.getLong(2) -> r.getString(0)).toMap
    assert(got == Map(20L -> "D", 21L -> "A"))
  }

  test("changeView renames positional PK slots and filters by table") {
    val pklog = Seq(
      Row("800", "2", null, null, null, null, 7L, "VBAK"),
      Row("900", "3", null, null, null, null, 8L, "OTHER"))
    val schema = org.apache.spark.sql.types.StructType(
      Cdc.PkLogSchema.filter(f => f.name.startsWith("PK") ||
        f.name == "TRANSACTIONID" || f.name == "TABLE_NAME"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pklog.toSeq), schema)
    val got = Cdc.changeView(df, "VBAK", Seq("MANDT", "VBELN")).collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "800" && got(0).getString(1) == "2" &&
      got(0).getLong(2) == 7L)
  }

  test("delta fold broadcasts the changed-key side (scale plan shape)") {
    val plan = Cdc.delta(changes, master, Seq(("id", "id")), 100L, 199L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
