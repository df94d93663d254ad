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

  test("a DIFFERENT batch mapping to a committed window fails loudly instead of dropping its documents") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec10")
    try {
      val (store, maint) = fixture(work)
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      // a mis-configured windowOf collapsing every batch onto window 1:
      // batch 5's documents would previously vanish with only a log line
      // (ADVICE r16 medium) — now the marker's stamped batchId trips
      val bad = new ManifestMaintainer(store, work.resolve("tok").toString,
        work.resolve("manifest").toString,
        windowOf = _ => 1L, seedOf = 100L + _)
      val ex = intercept[IllegalStateException](
        bad.processBatch(Seq((50L, "zz qq")).toDF("doc_id", "text"), 5L))
      assert(ex.getMessage.contains("not injective"), ex.getMessage)
      // the SAME batchId is an at-least-once replay and still no-ops
      val before = spanSet(maint)
      bad.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      assert(spanSet(maint) === before)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("retraction-ledger staging: torn stage debris never reaches readers and is never swept by others") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec11")
    try {
      val (_, maint) = fixture(work)
      maint.processBatch(
        Seq((10L, "ab ba"), (12L, "aa cc")).toDF("doc_id", "text"), 0L)
      // stage the crash a bare append could not survive: a torn parquet
      // part — but in the STAGING dir, where no reader ever lists it
      val stage = new java.io.File(work.resolve("manifest").toFile,
        "_retractions_stage-deadbeef")
      stage.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(stage, "part-torn.parquet").toPath,
        Array[Byte](1, 2, 3))
      assert(maint.readManifest(spark).select("doc_id").as[Long]
        .collect().toSet === Set(10L, 12L),
        "readers are blind to staged ledger debris")
      // the next retract publishes atomically and leaves FOREIGN stage
      // debris alone — sweeping it could delete a concurrent retract's
      // in-flight stage and silently lose that takedown (review r17 #2)
      maint.retract(Seq(12L).toDF("doc_id"))
      assert(stage.exists(), "foreign stage debris is never swept")
      assert(maint.readManifest(spark).select("doc_id").as[Long]
        .collect().toSet === Set(10L))
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("a BPE merge-table artifact serves the maintainer through the model-kind seam") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec12")
    try {
      val batch0 = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
      val store = new UpsertStore(spark, work.resolve("surv").toString,
        pkCols = Seq("content_hash"), numBuckets = 4, mergeOnRead = true)
      val surv0 = ManifestPipeline
        .initializeSurvivors(store, batch0, "doc_id", "text")
      val tokPath = work.resolve("tok").toString
      TokenizerStore.saveMerges(tokPath,
        graft.operators.ByteLevel.trainBpeBytes(surv0, "text", numMerges = 4))
      // the maintainer loads whatever KIND the artifact holds — a BPE
      // merge table serves the compiled greedy fusion (VERDICT r16 #2),
      // byte-level, so unseen scripts pack through unmerged byte symbols
      val maint = new ManifestMaintainer(store, tokPath,
        work.resolve("manifest").toString,
        windowOf = _ + 1L, seedOf = 100L + _, byteLevel = true)
      maint.processBatch(
        Seq((10L, "ab ba"), (11L, "世界 😀")).toDF("doc_id", "text"), 0L)
      val spans = spanSet(maint)
      assert(spans.map(_(1)).toSet === Set(10L, 11L))
      // the packed n_tok equals the direct compiled-serving count
      val direct = graft.operators.ByteLevel.tokenCountsBpeBytes(
        Seq((10L, "ab ba"), (11L, "世界 😀")).toDF("doc_id", "text"),
        "doc_id", "text", TokenizerStore.loadMerges(spark, tokPath))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spans.foreach(s =>
        assert(s(3) === direct(s(1).asInstanceOf[Long]),
          s"span n_tok diverged from direct serving for doc ${s(1)}"))
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("append under a silently swapped tokenizer model fails loudly; versioned adoption round-trips") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec13")
    try {
      val (store, maint) = fixture(work)
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      val v1 = maint.windowModelStamp(1L)
      assert(v1.nonEmpty, "window 1 carries its model stamp")
      // a RETRAIN lands at the same artifact path (different corpus →
      // different content hash); a fresh maintainer process picks it up
      val tokPath = work.resolve("tok").toString
      TokenizerStore.saveUnigram(tokPath,
        UnigramLm.train(Seq((1L, "xx yy zz ww")).toDF("doc_id", "text"),
          "text", vocabSize = 50, maxPieceLen = 2, seedSize = 10,
          emIters = 1, pruneFraction = 0.0), spark)
      val maint2 = new ManifestMaintainer(store, tokPath,
        work.resolve("manifest").toString,
        windowOf = _ + 1L, seedOf = 100L + _)
      val ex = intercept[IllegalStateException](
        maint2.processBatch(Seq((20L, "xx yy")).toDF("doc_id", "text"), 1L))
      assert(ex.getMessage.contains("adoptModel"), ex.getMessage)
      // explicit versioning: adoption records the old hash and appends
      // proceed under the new model, each window stamped with ITS model
      maint2.adoptModel(spark)
      maint2.processBatch(Seq((20L, "xx yy")).toDF("doc_id", "text"), 1L)
      val v2 = maint2.windowModelStamp(2L)
      assert(v2.nonEmpty && v2 != v1, "window 2 is stamped with the new model")
      assert(maint2.windowModelStamp(1L) === v1, "window 1 keeps its stamp")
      val hist = java.nio.file.Files.readString(
        work.resolve("manifest").resolve("_MODEL_HISTORY"))
      assert(hist.trim === v1.get, "the previous hash is the audit record")
      // adopting the already-current model is a no-op
      maint2.adoptModel(spark)
      assert(java.nio.file.Files.readString(
        work.resolve("manifest").resolve("_MODEL_HISTORY")).trim === v1.get)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("retokenizeWindow re-packs a window under the adopted model from its source batch") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec14")
    try {
      val (store, maint) = fixture(work)
      val batch1 = Seq((10L, "ab ba"), (12L, "aa cc")).toDF("doc_id", "text")
      maint.processBatch(batch1, 0L)
      val v1 = maint.windowModelStamp(1L)
      // retrain + adopt; the old window's units are now a recorded
      // mixed-version state until the operator re-tokenizes it
      val tokPath = work.resolve("tok").toString
      TokenizerStore.saveUnigram(tokPath,
        UnigramLm.train(batch1, "text", vocabSize = 50, maxPieceLen = 2,
          seedSize = 10, emIters = 1, pruneFraction = 0.0), spark)
      maint.adoptModel(spark)
      // the source batch is REQUIRED: a batch missing a window doc fails
      val ex = intercept[IllegalArgumentException](
        maint.retokenizeWindow(spark, 1L,
          Seq((10L, "ab ba")).toDF("doc_id", "text"), seed = 100L))
      assert(ex.getMessage.contains("source batch"), ex.getMessage)
      maint.retokenizeWindow(spark, 1L, batch1, seed = 100L)
      assert(maint.windowModelStamp(1L) !== v1, "window re-stamped")
      // spans now equal a direct pack of the same docs under the new model
      val direct = ManifestPipeline.packWindow(
        ManifestPipeline.survivorRows(batch1, "doc_id", "text"),
        "doc_id", "text", TokenizerStore.loadUnigram(spark, tokPath),
        window = 1L, shuffleSeed = 100L)
        .select("window", "doc_id", "shuffle_pos", "n_tok", "seq")
        .collect().map(_.toSeq).toSet
      assert(spanSet(maint) === direct)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("two writers with disjoint window spaces share one manifest: zero lost, zero double-packed windows") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec15")
    try {
      val batch0 = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
      // the rebase-capable store: two writers' merges must both land
      val store = new ManifestUpsertStore(spark,
        work.resolve("surv").toString, pkCols = Seq("content_hash"),
        numBuckets = 4)
      val surv0 = ManifestPipeline
        .initializeSurvivors(store, batch0, "doc_id", "text")
      val tokPath = work.resolve("tok").toString
      TokenizerStore.saveUnigram(tokPath,
        UnigramLm.train(surv0, "text", vocabSize = 50, maxPieceLen = 3,
          seedSize = 10, emIters = 1, pruneFraction = 0.0), spark)
      // backfill owns windows 1-4, tailer windows 5-8; feeds are
      // content-disjoint by construction (texts encode writer+batch+doc)
      def maintFor(base: Long) = new ManifestMaintainer(store, tokPath,
        work.resolve("manifest").toString,
        windowOf = bid => base + bid, seedOf = 200L + _,
        writerId = s"writer-$base")
      def batchFor(w: Int, b: Int) = (0 until 3).map { i =>
        (1000L + w * 100 + b * 10 + i,
          ("a" * (1 + i)) + " " + ("b" * (1 + b)) + " " + ("c" * (1 + w)))
      }.toDF("doc_id", "text")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def writer(w: Int, base: Long): Thread = new Thread(() => try {
        val m = maintFor(base)
        (0 until 4).foreach(b => m.processBatch(batchFor(w, b), b.toLong))
      } catch { case t: Throwable => errs.add(t) })
      val ta = writer(0, 1L)
      val tb = writer(1, 5L)
      ta.start(); tb.start(); ta.join(300000); tb.join(300000)
      assert(!ta.isAlive && !tb.isAlive, "a writer hung")
      assert(errs.isEmpty, s"writer failed: ${Option(errs.peek())}")
      val spans = maintFor(1L).readManifest(spark)
        .select("window", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // zero lost: all 8 windows committed with their 3 docs each
      assert(spans.map(_._1).toSet === (1L to 8L).toSet)
      assert(spans.length === 24, s"expected 24 spans, got ${spans.length}")
      // zero double-packed: every doc appears in exactly one window
      assert(spans.map(_._2).distinct.length === 24)
      // and the shared store converged to every content hash exactly once
      assert(store.snapshot().count() === 2 + 24)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("a window claimed by a foreign batch fails loudly; our own crashed claim is taken over") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec16")
    try {
      val (_, maint) = fixture(work) // windowOf = _ + 1
      val claims = new java.io.File(work.resolve("manifest").toFile, "_claims")
      claims.mkdirs()
      // a FOREIGN writer's claim on our window: loud, before any write —
      // even at the SAME batch id (batchId alone is not writer-unique)
      java.nio.file.Files.writeString(
        new java.io.File(claims, "window-1").toPath, "tailer\n0")
      val ex = intercept[IllegalStateException](
        maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L))
      assert(ex.getMessage.contains("claimed by writer 'tailer'"),
        ex.getMessage)
      // OUR crashed predecessor's claim (same writer + batch): take over
      java.nio.file.Files.writeString(
        new java.io.File(claims, "window-1").toPath, "writer-0\n0")
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      assert(spanSet(maint).nonEmpty)
      assert(!new java.io.File(claims, "window-1").exists(),
        "the claim is released once the marker guards")
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("aligned batch ids from a second writer are loud at the claim AND at the committed marker; an empty claim is takeover-able debris") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec19")
    try {
      val (store, maint) = fixture(work) // writerId = "writer-0"
      // a crashed claim CREATION: dirent survived, content did not —
      // must be treated as our own debris, not a permanent brick
      val claims = new java.io.File(work.resolve("manifest").toFile, "_claims")
      claims.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(claims, "window-1").toPath, "")
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      assert(spanSet(maint).nonEmpty, "empty claim debris is taken over")
      // a SECOND writer whose windowOf accidentally equals ours delivers
      // ITS batch 0 — same batchId, different documents: the committed
      // marker's writer stamp must refuse (a batchId-only guard would
      // silently skip this batch and lose its documents)
      val twin = new ManifestMaintainer(store,
        work.resolve("tok").toString, work.resolve("manifest").toString,
        windowOf = _ + 1L, seedOf = 100L + _, writerId = "tailer")
      val ex = intercept[IllegalStateException](
        twin.processBatch(Seq((50L, "zz qq")).toDF("doc_id", "text"), 0L))
      assert(ex.getMessage.contains("committed by writer 'writer-0'"),
        ex.getMessage)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("compactRetracted sweeps every affected window, self-heals a crashed predecessor, and is idempotent") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec17")
    try {
      val (_, maint) = fixture(work)
      // two windows, the takedown doc set hitting both
      maint.processBatch(
        Seq((10L, "ab ba"), (11L, "ba ab"), (12L, "aa cc"))
          .toDF("doc_id", "text"), 0L)
      maint.processBatch(
        Seq((20L, "ca bc"), (21L, "ad da")).toDF("doc_id", "text"), 1L)
      maint.retract(Seq(11L, 20L).toDF("doc_id"))
      // simulate a sweep that died after compacting window 2: window 2 is
      // compacted but its publish "crashed" — the compacted generation
      // sits as a marker-bearing staged tmp, live missing (mmspec9 shape)
      maint.compactWindow(spark, 2L, seed = 101L)
      val live2 = new java.io.File(work.resolve("manifest").toString, "window-2")
      java.nio.file.Files.move(live2.toPath,
        new java.io.File(live2.getPath + "_tmp").toPath)
      // the re-run sweep must self-heal window 2, then compact the still-
      // dirty window 1 — and report exactly the windows it compacted
      val swept = maint.compactRetracted(spark, w => 100L + (w - 1))
      assert(swept === Seq(1L), s"expected only window 1 left to compact, got $swept")
      assert(live2.exists(), "the crashed publish healed forward")
      val spans = spanSet(maint)
      assert(spans.map(_(1)).toSet === Set(10L, 12L, 21L))
      // dense re-pack in BOTH windows (positions restart at 0 per window)
      assert(spans.filter(_(0) == 1L).map(_(2)).toSet === Set(0L, 1L))
      assert(spans.filter(_(0) == 2L).map(_(2)).toSet === Set(0L))
      // idempotent: nothing left to sweep, nothing re-published
      assert(maint.compactRetracted(spark, w => 100L + (w - 1)).isEmpty)
      assert(spanSet(maint) === spans)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("a stamp-only marker (empty batchId line) reads as unrecorded, never as a parse crash") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec18")
    try {
      val (_, maint) = fixture(work)
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      // a pre-r17 window later rewritten with only a model stamp: first
      // marker line empty, second line the hash — replays must treat the
      // batchId as unrecorded (tolerant skip), not parse the hash
      val marker = new java.io.File(
        work.resolve("manifest").toString + "/window-1/_WINDOW_COMMITTED")
      java.nio.file.Files.writeString(marker.toPath, "\ndeadbeefcafe")
      val before = spanSet(maint)
      maint.processBatch(Seq((99L, "zz")).toDF("doc_id", "text"), 0L)
      assert(spanSet(maint) === before, "the committed window stays as-is")
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("retokenizeWindow accepts a source batch that legally omits retracted texts; a pre-commit sweep is a no-op") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec20")
    try {
      val (_, maint) = fixture(work)
      // a retraction BEFORE any window commits: the sweep must answer
      // "nothing to sweep", not throw (retract has no such precondition)
      maint.retract(Seq(999L).toDF("doc_id"))
      assert(maint.compactRetracted(spark, _ => 0L) === Seq.empty)
      val batch1 = Seq((10L, "ab ba"), (11L, "ba ab"), (12L, "aa cc"))
        .toDF("doc_id", "text")
      maint.processBatch(batch1, 0L)
      maint.retract(Seq(11L).toDF("doc_id"))
      // the caller may be legally REQUIRED to have deleted doc 11's text:
      // a source batch without it must still re-tokenize the window
      // (the retracted doc is dropped by the rewrite anyway)
      maint.adoptModel(spark)
      maint.retokenizeWindow(spark, 1L,
        batch1.where($"doc_id" =!= 11L), seed = 100L)
      assert(spanSet(maint).map(_(1)).toSet === Set(10L, 12L))
      // a genuinely-missing LIVE doc still fails loudly
      val ex = intercept[IllegalArgumentException](
        maint.retokenizeWindow(spark, 1L,
          Seq((10L, "ab ba")).toDF("doc_id", "text"), seed = 100L))
      assert(ex.getMessage.contains("source batch"), ex.getMessage)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("empty-claim takeover RE-ASSERTS ownership: a second writer racing the debris fails loud while the winner is mid-pack") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec21")
    try {
      val (store, _) = fixture(work)
      val claims = new java.io.File(work.resolve("manifest").toFile, "_claims")
      claims.mkdirs()
      // crashed claim CREATION debris: the dirent exists, the bytes do not
      java.nio.file.Files.writeString(
        new java.io.File(claims, "window-1").toPath, "")
      // writer A takes the debris over and PAUSES mid-pack (the seam);
      // pre-fix, the claim file stayed EMPTY at this point, so writer B
      // would also classify it as 'ours' and pack the window concurrently
      val packing = new java.util.concurrent.CountDownLatch(1)
      val resume = new java.util.concurrent.CountDownLatch(1)
      val a = new ManifestMaintainer(store, work.resolve("tok").toString,
        work.resolve("manifest").toString,
        windowOf = _ + 1L, seedOf = 100L + _, writerId = "writer-a") {
        override protected def afterClaim(): Unit = {
          packing.countDown(); resume.await()
        }
      }
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ta = new Thread(() => try a.processBatch(
        Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      catch { case t: Throwable => errs.add(t) })
      ta.start()
      assert(packing.await(60, java.util.concurrent.TimeUnit.SECONDS))
      val b = new ManifestMaintainer(store, work.resolve("tok").toString,
        work.resolve("manifest").toString,
        windowOf = _ + 1L, seedOf = 100L + _, writerId = "writer-b")
      val ex = intercept[IllegalStateException](
        b.processBatch(Seq((20L, "zz qq")).toDF("doc_id", "text"), 0L))
      assert(ex.getMessage.contains("claimed by writer 'writer-a'"),
        ex.getMessage)
      resume.countDown(); ta.join(300000)
      assert(!ta.isAlive && errs.isEmpty, s"writer A failed: ${Option(errs.peek())}")
      assert(spanSet(a).map(_(1)).toSet === Set(10L))
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("a torn one-line claim: OUR writerId is crash debris taken over, a FOREIGN one stays loud") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec22")
    try {
      val (_, maint) = fixture(work) // writerId = "writer-0"
      val claims = new java.io.File(work.resolve("manifest").toFile, "_claims")
      claims.mkdirs()
      val claim = new java.io.File(claims, "window-1")
      // power-cut-torn claim that kept only OUR writerId line: pre-fix
      // this was classified FOREIGN and permanently bricked our replay
      java.nio.file.Files.writeString(claim.toPath, "writer-0")
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      assert(spanSet(maint).map(_(1)).toSet === Set(10L))
      // a torn FOREIGN single-line claim is still a foreign fence
      java.nio.file.Files.writeString(
        new java.io.File(claims, "window-2").toPath, "tailer")
      val ex = intercept[IllegalStateException](
        maint.processBatch(Seq((20L, "cc aa")).toDF("doc_id", "text"), 1L))
      assert(ex.getMessage.contains("claimed by writer 'tailer'"),
        ex.getMessage)
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("reclaimWindow releases a dead writer's claim so a replacement completes the window without double-packing") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec23")
    try {
      val (store, maint) = fixture(work) // writer-0
      val batch1 = Seq((10L, "ab ba"), (12L, "aa cc")).toDF("doc_id", "text")
      // stage writer-0's WORST mid-pack crash: spans written AND store
      // merged, marker never written, claim never released
      maint.processBatch(batch1, 0L)
      val manifest = work.resolve("manifest").toString
      val marker = new java.io.File(manifest + "/window-1/_WINDOW_COMMITTED")
      assert(marker.delete())
      val claims = new java.io.File(manifest, "_claims"); claims.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(claims, "window-1").toPath, "writer-0\n0")
      // the replacement writer is fenced by the dead owner's claim
      val b = new ManifestMaintainer(store, work.resolve("tok").toString,
        manifest, windowOf = _ + 1L, seedOf = 100L + _,
        writerId = "writer-b")
      intercept[IllegalStateException](b.processBatch(batch1, 0L))
      // reclaim refuses without force (the owner COULD be alive)...
      val ex = intercept[IllegalArgumentException](b.reclaimWindow(1L))
      assert(ex.getMessage.contains("force"), ex.getMessage)
      // ...and releases with it; the replacement replay completes forward
      assert(b.reclaimWindow(1L, force = true))
      val seqBefore = store.currentSeq
      b.processBatch(batch1, 0L)
      assert(marker.exists(), "the replacement committed the window")
      assert(store.currentSeq === seqBefore, "no double store merge")
      val spans = spanSet(b)
      assert(spans.map(_(1)).toSet === Set(10L, 12L) && spans.size === 2,
        s"no double-packed spans, got $spans")
      // a spent claim on a COMMITTED window reclaims without force
      java.nio.file.Files.writeString(
        new java.io.File(claims, "window-1").toPath, "writer-0\n0")
      assert(b.reclaimWindow(1L))
      assert(!new java.io.File(claims, "window-1").exists())
      assert(!b.reclaimWindow(1L), "nothing left to reclaim")
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("retokenizeWindow restamps a SPANLESS window's marker with the adopted model") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec24")
    try {
      val (_, maint) = fixture(work)
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      // batch 1 fully duplicates window 1's content → window 2 commits
      // spanless, stamped with model v1
      maint.processBatch(Seq((20L, "ab ba")).toDF("doc_id", "text"), 1L)
      val v1 = maint.windowModelStamp(2L)
      val tokPath = work.resolve("tok").toString
      graft.operators.TokenizerStore.saveUnigram(tokPath,
        UnigramLm.train(Seq((1L, "xx yy zz")).toDF("doc_id", "text"),
          "text", vocabSize = 50, maxPieceLen = 2, seedSize = 10,
          emIters = 1, pruneFraction = 0.0), spark)
      maint.adoptModel(spark)
      // the uniform-units-restored pass: the spanless window must carry
      // the adopted stamp afterwards, not silently keep v1 (ADVICE r17)
      maint.retokenizeWindow(spark, 2L,
        Seq((20L, "ab ba")).toDF("doc_id", "text"), seed = 101L)
      val v2 = maint.windowModelStamp(2L)
      assert(v2.nonEmpty && v2 != v1, s"spanless window restamped, got $v2")
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("retokenizeWindow preserves an UNRECORDED writer stamp so a renamed maintainer's replay still no-ops") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec25")
    try {
      val (store, maint) = fixture(work)
      val batch1 = Seq((10L, "ab ba")).toDF("doc_id", "text")
      maint.processBatch(batch1, 0L)
      // a pre-r17 window: marker carries batchId + stamp but NO writer
      val marker = new java.io.File(
        work.resolve("manifest").toString + "/window-1/_WINDOW_COMMITTED")
      val stamp = maint.windowModelStamp(1L).get
      java.nio.file.Files.writeString(marker.toPath, s"0\n$stamp")
      maint.retokenizeWindow(spark, 1L, batch1, seed = 100L)
      // pre-fix the rewrite adopted the re-tokenizer's writerId, making
      // this legitimate replay (same batch, differently-named maintainer)
      // throw 'committed by writer' instead of no-opping
      val renamed = new ManifestMaintainer(store,
        work.resolve("tok").toString, work.resolve("manifest").toString,
        windowOf = _ + 1L, seedOf = 100L + _, writerId = "writer-renamed")
      val before = spanSet(maint)
      renamed.processBatch(batch1, 0L)
      assert(spanSet(renamed) === before, "the replay no-ops")
    } finally graft.util.Fs.rmTree(work.toFile)
  }

  test("an empty _MODEL_CURRENT pin is repaired create-exclusively") {
    val work = java.nio.file.Files.createTempDirectory("graft-mmspec26")
    try {
      val (_, maint) = fixture(work)
      maint.processBatch(Seq((10L, "ab ba")).toDF("doc_id", "text"), 0L)
      val pin = work.resolve("manifest").resolve("_MODEL_CURRENT")
      val h = java.nio.file.Files.readString(pin).trim
      // crashed first-pin: dirent survived, bytes did not
      java.nio.file.Files.writeString(pin, "")
      maint.processBatch(Seq((11L, "ba ab")).toDF("doc_id", "text"), 1L)
      assert(java.nio.file.Files.readString(pin).trim === h,
        "the repair re-pins the same model hash")
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
