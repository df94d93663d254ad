package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window => LogicalWindow}
import org.apache.spark.sql.types.StringType

/** Guards the r8 gram-hash operators' load-bearing scale claim: gram
  * STRINGS never cross a shuffle — every aggregate, join, and window in
  * the plan consumes 8-byte hashes (plus numeric ids/positions), with the
  * text column pruned before the first exchange. A regression that leaks
  * the text or a gram string into a shuffle key would multiply shuffle
  * bytes ~10× at 100 TB without failing any correctness gate; this spec
  * fails it at build time.
  */
class ShuffleGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Fails if any shuffle-boundary operator (Aggregate / Join / Window)
    * in the optimized plan takes a string-typed column as input. Logical
    * boundaries are checked — stricter than physical (a broadcast join
    * would pass physically but is still string-free here).
    */
  private def assertNoStringAcrossShuffles(df: DataFrame, name: String): Unit = {
    val offenders = df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        j.children.flatMap(_.output).filter(_.dataType == StringType)
          .map(a => s"$name: join input carries string ${a.name}")
      case a: Aggregate =>
        a.child.output.filter(_.dataType == StringType)
          .map(x => s"$name: aggregate input carries string ${x.name}")
      case w: LogicalWindow =>
        w.child.output.filter(_.dataType == StringType)
          .map(x => s"$name: window input carries string ${x.name}")
    }.flatten
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("duplicated-span detection shuffles only hashes and positions") {
    assertNoStringAcrossShuffles(
      SparkEntry.queries("q_dedup_spans")(spark, sf), "q_dedup_spans")
  }

  test("corpus-LM scoring shuffles only hashes and counts") {
    assertNoStringAcrossShuffles(
      SparkEntry.queries("q_text_lm_score")(spark, sf), "q_text_lm_score")
  }

  test("minhash pair generation shuffles only hashes") {
    assertNoStringAcrossShuffles(
      SparkEntry.queries("q_dedup_minhash_pairs")(spark, sf),
      "q_dedup_minhash_pairs")
  }

  test("span windows are per-document, never global") {
    val global = SparkEntry.queries("q_dedup_spans")(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
    assert(global.isEmpty, "unpartitioned Window in q_dedup_spans")
  }

  // ── Round-9 operator plan shapes ─────────────────────────────────────

  test("script profile and deflate gates plan zero shuffles (map-side only)") {
    for (q <- Seq("q_text_scripts", "q_text_deflate")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q shuffles:\n$plan")
    }
  }

  test("r9 map-side gates plan zero shuffles: fingerprint, wordpiece, int8") {
    for (q <- Seq("q_text_fingerprint", "q_text_wordpiece",
        "q_emb_quantize_int8")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q shuffles:\n$plan")
    }
  }

  test("quantile sketch windows are per-group and run over bins, not rows") {
    val df = SparkEntry.queries("q_quantile_sketch")(spark, sf)
    val global = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "unpartitioned Window in q_quantile_sketch")
    // the window input is the (group, bin, n) sketch — if a regression
    // windowed over raw values its input would carry the value column
    val winInputs = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow => w.child.output.map(_.name)
    }.flatten.toSet
    assert(winInputs.contains("bin") && !winInputs.contains("value"),
      winInputs.toString)
  }

  test("line dedup: the frequent-line set broadcasts, reassembly is one agg") {
    val plan = SparkEntry.queries("q_line_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"frequent-set join shuffled:\n$plan")
  }
}
