package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{ManifestPipeline, TokenizerStore, UnigramLm}

/** Pins [[ManifestMaintainer]]'s crash/replay protocol — each ambiguous
  * interruption point is staged explicitly and the replay must complete
  * FORWARD to the identical manifest.
  */
class ManifestMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(work: java.nio.file.Path) = {
    val batch0 = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val store = new UpsertStore(spark, work.resolve("surv").toString,
      pkCols = Seq("content_hash"), numBuckets = 4, mergeOnRead = true)
    val surv0 = ManifestPipeline
      .initializeSurvivors(store, batch0, "doc_id", "text")
    val tokPath = work.resolve("tok").toString
    TokenizerStore.saveUnigram(tokPath,
      UnigramLm.train(surv0, "text", vocabSize = 50, maxPieceLen = 3,
        seedSize = 10, emIters = 1, pruneFraction = 0.0), spark)
    val maint = new ManifestMaintainer(store, tokPath,
      work.resolve("manifest").toString,
      windowOf = _ + 1L, seedOf = 100L + _)
    (store, maint)
  }

  private def spanSet(maint: ManifestMaintainer) =
    maint.readManifest(spark)
      .select("window", "doc_id", "shuffle_pos", "n_tok", "seq")
      .collect().map(_.toSeq).toSet

  test("committed-marker replay is a no-op and the manifest is unchanged") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec1")
    try {
      val (store, maint) = fixture(work)
      val batch1 = Seq((10L, "ab ba"), (11L, "aa bb")).toDF("doc_id", "text")
      maint.processBatch(batch1, 0L)
      val before = spanSet(maint)
      val seqBefore = store.currentSeq
      maint.processBatch(batch1, 0L) // redelivery of a committed batch
      assert(spanSet(maint) === before)
      assert(store.currentSeq === seqBefore)
      // the later-duplicate's id (11) never entered the span set
      assert(!before.exists(_(1) == 11L))
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("crash between store merge and marker completes forward on replay") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec2")
    try {
      val (store, maint) = fixture(work)
      val batch1 = Seq((10L, "ab ba")).toDF("doc_id", "text")
      maint.processBatch(batch1, 0L)
      val before = spanSet(maint)
      // stage the crash: spans written, store merged, marker LOST
      val marker = new java.io.File(
        work.resolve("manifest").toString + "/window-1/_WINDOW_COMMITTED")
      assert(marker.delete())
      // fresh now folds to empty while the dir holds spans — the one
      // ambiguous state; replay must restore the marker, not wipe spans
      maint.processBatch(batch1, 0L)
      assert(marker.exists(), "replay re-commits the window")
      assert(spanSet(maint) === before, "spans survive the completion")
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("crash before the store merge overwrites stale spans on replay") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec3")
    try {
      val (store, maint) = fixture(work)
      val batch1 = Seq((10L, "ab ba")).toDF("doc_id", "text")
      // stage the crash: a half-written (WRONG) span file exists, no
      // marker, store NOT merged — replay must rebuild from scratch
      val dir = new java.io.File(
        work.resolve("manifest").toString + "/window-1")
      Seq((1L, 99L, 0L, 1L, 0L, 0L, 0L, 1L, 0L))
        .toDF("window", "doc_id", "shuffle_pos", "n_tok", "cum_before",
          "seq", "tok_start", "tok_end", "seq_offset")
        .write.mode("overwrite").parquet(dir.getPath)
      maint.processBatch(batch1, 0L)
      val spans = spanSet(maint)
      assert(spans.nonEmpty && spans.forall(_(1) == 10L),
        s"garbage spans must be overwritten, got $spans")
      assert(store.snapshot().where(col("doc_id") === 10L).count() === 1,
        "the replayed fold reaches the store")
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("retraction hides spans immediately, bans re-crawled content, and compaction re-packs dense") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec6")
    try {
      val (store, maint) = fixture(work)
      maint.processBatch(
        Seq((10L, "ab ba"), (11L, "ba ab"), (12L, "aa cc")).toDF("doc_id", "text"), 0L)
      assert(spanSet(maint).map(_(1)).toSet === Set(10L, 11L, 12L))
      // takedown doc 11: logically gone from every read at once
      maint.retract(Seq(11L).toDF("doc_id"))
      val logical = maint.readManifest(spark)
      assert(logical.select("doc_id").as[Long].collect().toSet === Set(10L, 12L))
      // ...but its positions still show the hole (pre-compaction MOR read)
      val posBefore = logical.select("shuffle_pos").as[Long].collect().toSet
      // banned content cannot re-enter under a new id
      val replayDup = ManifestPipeline.freshSurvivors(store,
        Seq((99L, "ba ab")).toDF("doc_id", "text"), "doc_id", "text")
      assert(replayDup.isEmpty, "retracted content stays banned in the store")
      // physical compaction: remaining docs re-pack densely at the seed
      maint.compactWindow(spark, 1L, seed = 100L)
      val dense = maint.readManifest(spark)
        .select("doc_id", "shuffle_pos").collect()
      assert(dense.map(_.getLong(0)).toSet === Set(10L, 12L))
      val pos = dense.map(_.getLong(1)).distinct.sorted
      assert(pos.toSeq === Seq(0L, 1L), s"positions re-packed dense, got $pos")
      assert(posBefore.max >= 1L, "pre-compaction read kept original positions")
      // compaction is idempotent — AND a physical no-op (the window's
      // files are not re-published when it holds no retracted doc)
      val fileBefore = new java.io.File(
        work.resolve("manifest").toString + "/window-1").listFiles()
        .map(_.getName).toSet
      maint.compactWindow(spark, 1L, seed = 100L)
      val fileAfter = new java.io.File(
        work.resolve("manifest").toString + "/window-1").listFiles()
        .map(_.getName).toSet
      assert(fileAfter === fileBefore, "no-op compaction must not re-publish")
      assert(maint.readManifest(spark).select("doc_id", "shuffle_pos")
        .collect().toSet === dense.toSet)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("a crashed compaction fails readers loud and heals on the next writer pass") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec7")
    try {
      val (_, maint) = fixture(work)
      maint.processBatch(Seq((10L, "ab ba"), (12L, "aa cc"))
        .toDF("doc_id", "text"), 0L)
      maint.retract(Seq(12L).toDF("doc_id"))
      maint.compactWindow(spark, 1L, seed = 100L)
      val expect = maint.readManifest(spark).collect().toSet
      // stage the crash: live retired to _old, publish never happened
      val live = new java.io.File(work.resolve("manifest").toString, "window-1")
      val aside = new java.io.File(live.getPath + "_old")
      java.nio.file.Files.move(live.toPath, aside.toPath)
      val ex = intercept[IllegalStateException](maint.readManifest(spark))
      assert(ex.getMessage.contains("compaction crashed mid-publish"))
      maint.compactWindow(spark, 1L, seed = 100L) // the writer heals
      assert(maint.readManifest(spark).collect().toSet === expect)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("a takedown sweep no-ops over empty committed windows, and an all-empty manifest reads as zero rows") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec8")
    try {
      val (_, maint) = fixture(work)
      // first batch fully duplicates the bootstrap content → the ONLY
      // committed window is empty; a healthy pipeline must read as empty
      maint.processBatch(Seq((30L, "aa bb")).toDF("doc_id", "text"), 0L)
      assert(maint.readManifest(spark).isEmpty,
        "all-empty manifest reads as zero rows, not an error")
      // a real window, a retraction, then the operator's sweep over ALL
      // committed windows — the empty one must not kill the sweep
      maint.processBatch(Seq((31L, "ab ba")).toDF("doc_id", "text"), 1L)
      maint.retract(Seq(31L).toDF("doc_id"))
      maint.compactWindow(spark, 1L, seed = 100L) // the empty window
      maint.compactWindow(spark, 2L, seed = 101L) // the retracted one
      assert(maint.readManifest(spark).isEmpty)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("a backfill replay over a crashed compaction heals forward instead of resurrecting an empty window") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec9")
    try {
      val (_, maint) = fixture(work)
      val batch1 = Seq((10L, "ab ba"), (12L, "aa cc")).toDF("doc_id", "text")
      maint.processBatch(batch1, 0L)
      maint.retract(Seq(12L).toDF("doc_id"))
      maint.compactWindow(spark, 1L, seed = 100L)
      val expect = maint.readManifest(spark)
        .select("doc_id", "shuffle_pos").collect().toSet
      // stage the worst crash point: live retired AND the compacted tmp
      // fully staged (marker-bearing) — the publish rename never ran
      val live = new java.io.File(work.resolve("manifest").toString, "window-1")
      val aside = new java.io.File(live.getPath + "_old")
      val tmp = new java.io.File(live.getPath + "_tmp")
      java.nio.file.Files.move(live.toPath, tmp.toPath)
      // (the spec reuses the compacted dir as the staged tmp — same shape)
      assert(!live.exists() && tmp.exists())
      // the at-least-once REPLAY of the window's batch arrives first:
      // it must heal the publish, see the marker, and no-op — NOT create
      // a new empty live dir over the recoverable generations
      maint.processBatch(batch1, 0L)
      assert(live.exists() && !tmp.exists() && !aside.exists())
      assert(maint.readManifest(spark)
        .select("doc_id", "shuffle_pos").collect().toSet === expect,
        "the staged compaction survives the replay")
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("a byte-level maintainer packs a window carrying a script the model never saw") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec5")
    try {
      val batch0 = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
      val store = new UpsertStore(spark, work.resolve("surv").toString,
        pkCols = Seq("content_hash"), numBuckets = 4, mergeOnRead = true)
      val surv0 = ManifestPipeline
        .initializeSurvivors(store, batch0, "doc_id", "text")
      val tokPath = work.resolve("tok").toString
      TokenizerStore.saveUnigram(tokPath,
        graft.operators.ByteLevel.trainUnigramBytes(surv0, "text",
          vocabSize = 400, maxPieceLen = 3, seedSize = 10, emIters = 1,
          pruneFraction = 0.0), spark)
      val maint = new ManifestMaintainer(store, tokPath,
        work.resolve("manifest").toString,
        windowOf = _ + 1L, seedOf = 100L + _, byteLevel = true)
      // the operational case byteLevel exists for: a crawl window brings
      // CJK + emoji the window-0 tokenizer never trained on — the char
      // maintainer would kill the stream; the byte one packs it
      maint.processBatch(Seq((10L, "世界 😀 привет")).toDF("doc_id", "text"), 0L)
      val spans = spanSet(maint)
      assert(spans.nonEmpty && spans.forall(_(1) == 10L))
      // byte token counts: at least one token per suffix word's bytes
      assert(spans.head(3).asInstanceOf[Long] > 0L)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("an all-duplicate batch commits an empty window readers never see") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec4")
    try {
      val (_, maint) = fixture(work)
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      // batch 1 duplicates window 0's content entirely
      maint.processBatch(Seq((20L, "ab ba")).toDF("doc_id", "text"), 1L)
      val marker2 = new java.io.File(
        work.resolve("manifest").toString + "/window-2/_WINDOW_COMMITTED")
      assert(marker2.exists(), "the empty window still commits (replay-stable)")
      assert(spanSet(maint).forall(_(0) == 1L),
        "readManifest serves only windows with spans")
    } finally graft.util.Fs.rmTree(work.toFile)
  }
}
