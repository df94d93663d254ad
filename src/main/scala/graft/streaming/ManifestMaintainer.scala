package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ManifestPipeline, TokenizerStore}
import graft.util.Fs

/** Streaming maintenance loop for the incremental pre-training manifest
  * (r16 — the feed-driven sibling of the batch `ManifestPipeline` gate,
  * the same role [[AnnIndexMaintainer]] plays for the vector index): a
  * `foreachBatch` sink that folds each micro-batch of NEW documents
  * against the survivor [[UpsertStore]], tokenizes only the genuinely
  * new survivors under the STORED tokenizer, and appends their packed
  * spans as an immutable window directory.
  *
  * Crash/replay protocol (at-least-once upstream is assumed; every step
  * is ordered so a replayed batch id completes forward):
  *
  *   1. a `_WINDOW_COMMITTED` marker inside the window dir short-circuits
  *      fully-delivered replays;
  *   2. the fresh-survivor set is computed WITHOUT merging
  *      ([[ManifestPipeline.freshSurvivors]]) and the window's spans are
  *      written (overwrite, fsynced) BEFORE the store merge — a crash
  *      anywhere up to the merge replays to the identical fresh set and
  *      rewrites identical spans;
  *   3. the store merge ([[ManifestPipeline.mergeSurvivors]]) is an LWW
  *      upsert of content hashes — re-merging the same keys is a no-op;
  *   4. the marker is written (fsync-ordered) only after the merge, so a
  *      crash between merge and marker replays into the one remaining
  *      ambiguous state: fresh now folds to EMPTY while the window dir
  *      already holds the spans — recognized exactly by `empty fresh +
  *      existing dir`, completed by writing the marker alone. A
  *      LEGITIMATELY all-duplicate batch never writes a span file, so
  *      the two empty-fresh cases cannot be confused.
  *
  * Scale shape per window: identical to the batch pipeline — curation is
  * upstream, the fold shuffles delta-sized md5 keys, tokenization is
  * distinct-word × broadcast-model, packing is window-local. History is
  * touched only as the store's bucketed key set.
  *
  * {{{
  * val maint = new ManifestMaintainer(store, tokPath, dir,
  *   windowOf = _ + 2, seedOf = bid => 1000L + bid)
  * docs.writeStream.foreachBatch(maint.processBatch _).start()
  * }}}
  */
class ManifestMaintainer(store: UpsertStore, tokenizerPath: String,
    manifestDir: String, windowOf: Long => Long, seedOf: Long => Long,
    idCol: String = "doc_id", textCol: String = "text",
    budget: Long = 512L, byteLevel: Boolean = false) extends Logging {

  @volatile private var cachedModel: Seq[(String, Long)] = null

  private def model(spark: SparkSession): Seq[(String, Long)] = {
    if (cachedModel == null)
      cachedModel = TokenizerStore.loadUnigram(spark, tokenizerPath)
    cachedModel
  }

  private def windowDir(window: Long) =
    new java.io.File(manifestDir, s"window-$window")

  private def markerOf(dir: java.io.File) =
    new java.io.File(dir, "_WINDOW_COMMITTED")

  /** Apply one micro-batch of raw (curated) documents. Also usable
    * un-streamed (backfills, replays, tests).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val window = windowOf(batchId)
    val dir = windowDir(window)
    // heal a crashed COMPACTION of this window before anything else: a
    // backfill replay hitting the live-retired/publish-pending state
    // would otherwise see no marker, fold to empty fresh, and commit a
    // NEW empty live dir — after which the next healer's debris sweep
    // would destroy both surviving generations (r16 self-review #2)
    recoverWindowCrash(dir)
    val marker = markerOf(dir)
    if (marker.exists()) {
      logInfo(s"batch $batchId: window $window already committed, skipping")
      return
    }
    val fresh = ManifestPipeline.freshSurvivors(store, batch, idCol, textCol)
    try {
      if (fresh.isEmpty) {
        // either a legitimately all-duplicate batch (no dir ever written)
        // or a crash between merge and marker (dir holds the spans):
        // both complete by committing the window as-is
        dir.mkdirs()
      } else {
        ManifestPipeline
          .packWindow(fresh, idCol, textCol, model(spark), window,
            seedOf(batchId), budget, byteLevel)
          .write.mode("overwrite").parquet(dir.getPath)
        Fs.fsyncTree(dir) // spans durable BEFORE the store learns the keys
        ManifestPipeline.mergeSurvivors(store, fresh, idCol, txnId = batchId)
      }
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      Fs.fsyncFile(marker)
      Fs.fsyncDir(dir)
    } finally fresh.unpersist() // a long stream must not pin every batch's
                                // checkpoint blocks until a driver GC
  }

  /** All committed windows' spans (uncommitted window dirs are excluded —
    * a reader never observes a half-delivered window), with RETRACTED
    * documents filtered out: the manifest's merge-on-read rule. A
    * retraction is visible to every reader the moment its ledger entry
    * is durable; [[compactWindow]] later restores the packing invariant
    * physically.
    */
  def readManifest(spark: SparkSession): DataFrame = {
    val all = Option(new java.io.File(manifestDir).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
    // reader contract (the TokenizerStore shape): a window whose live dir
    // is gone while its staged/retired compaction twin survives is a
    // crashed writer — fail LOUD instead of silently training without
    // that window; the next compactWindow (the writer) heals it
    all.filter(d => d.getName.endsWith("_tmp") || d.getName.endsWith("_old"))
      .foreach { d =>
        val liveName = d.getName.stripSuffix("_tmp").stripSuffix("_old")
        if (!all.exists(_.getName == liveName))
          throw new IllegalStateException(
            s"manifest window $liveName has no live generation but a " +
              "recoverable staged/retired one exists — a compaction " +
              "crashed mid-publish; re-run compactWindow to heal")
      }
    val committed = all.filter(d => !d.getName.startsWith("_") &&
      !d.getName.endsWith("_tmp") && !d.getName.endsWith("_old") &&
      markerOf(d).exists())
    require(committed.nonEmpty,
      s"no committed manifest windows under $manifestDir")
    val dirs = committed
      .filter(_.listFiles().exists(_.getName.endsWith(".parquet")))
      .map(_.getPath)
    // every committed window may legitimately be empty (all-duplicate
    // batches): a healthy-but-spanless manifest reads as zero rows, not
    // an error (r16 self-review #3)
    if (dirs.isEmpty) return emptySpans(spark)
    val spans = spark.read.parquet(dirs: _*)
    retractedIds(spark) match {
      case Some(ids) =>
        spans.join(org.apache.spark.sql.functions.broadcast(ids),
          Seq(idCol), "left_anti")
      case None => spans
    }
  }

  /** The manifest's canonical span schema, empty — what a committed but
    * spanless manifest reads as.
    */
  private def emptySpans(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq("window", idCol, "shuffle_pos", "n_tok", "cum_before",
        "seq", "tok_start", "tok_end", "seq_offset")
        .map(StructField(_, LongType, nullable = false))))
  }

  // ── Retraction (takedowns / right-to-be-forgotten) ──────────────────────

  private def retractionsDir = new java.io.File(manifestDir, "_retractions")

  private def retractedIds(spark: SparkSession): Option[DataFrame] = {
    val files = Option(retractionsDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    if (files.isEmpty) None
    else Some(spark.read.parquet(retractionsDir.getPath)
      .select(idCol).distinct())
  }

  /** Retract documents from the manifest: their ids enter an append-only
    * ledger (fsync-durable before return), [[readManifest]] filters them
    * from every window immediately, and the survivor STORE keeps their
    * content hashes — retracted content is BANNED, so a later re-crawl of
    * the same bytes cannot re-enter under a new id. Spans already emitted
    * stay on disk until [[compactWindow]] rewrites the window — exactly
    * the MOR store's logical-delete-then-compact lifecycle, applied to
    * training data.
    *
    * Scale: the ledger holds every id EVER retracted — takedown-sized
    * (thousands), not corpus-sized — and the read-time filter broadcasts
    * it once per read; it is intentionally never pruned, because a
    * pruned id arriving again via an at-least-once replay of an OLD
    * window's batch would resurrect its spans. The ban-on-recrawl
    * guarantee lives in the survivor STORE's kept hashes, not here.
    */
  def retract(ids: DataFrame): Unit = {
    retractionsDir.mkdirs()
    ids.select(idCol).distinct()
      .coalesce(1) // ledger entries are takedown-batch-sized
      .write.mode("append").parquet(retractionsDir.getPath)
    Fs.fsyncTree(retractionsDir)
    Fs.fsyncDir(retractionsDir.getParentFile)
  }

  /** Physically rewrite one window without its retracted documents,
    * re-packing the REMAINING docs at the window's own seed so the
    * 512-dense span invariant holds again (read-time filtering leaves
    * holes; training wants dense sequences). The rewrite is the
    * TokenizerStore retire-aside protocol: staged tmp (payload fsynced
    * BEFORE its marker), retire live, atomic publish, debris cleared —
    * and [[compactWindow]] heals a crashed predecessor on entry. The
    * doc set and token counts come from the window's own span rows, so
    * compaction never re-reads corpus text or re-tokenizes.
    */
  def compactWindow(spark: SparkSession, windowId: Long, seed: Long): Unit = {
    import org.apache.spark.sql.functions._
    val live = windowDir(windowId)
    recoverWindowCrash(live)
    require(markerOf(live).exists(), s"window $windowId is not committed")
    val retracted = retractedIds(spark)
    if (retracted.isEmpty) return
    // a committed all-duplicate window holds only its marker — nothing to
    // compact, and spark.read.parquet over zero data files would throw
    // (r16 self-review #1)
    if (!live.listFiles().exists(_.getName.endsWith(".parquet"))) return
    val current = spark.read.parquet(live.getPath)
      .select(col(idCol), col("n_tok")).distinct()
      .localCheckpoint(true) // decouple from the files the swap replaces
    try {
      // physical no-op when the window holds none of the retracted docs —
      // re-running compaction after a takedown elsewhere must not churn
      // this window's files (idempotence is a no-op, not a re-publish)
      if (current.join(broadcast(retracted.get), Seq(idCol), "left_semi")
          .isEmpty) return
      val remaining = current
        .join(broadcast(retracted.get), Seq(idCol), "left_anti")
      val repacked = graft.operators.Shards.packSpans(
          graft.operators.Sampling.shuffled(remaining, idCol, seed),
          "shuffle_pos", "n_tok", budget)
        .withColumn("window", lit(windowId))
        .select(col("window"), col(idCol), col("shuffle_pos"), col("n_tok"),
          col("cum_before"), col("seq"), col("tok_start"), col("tok_end"),
          col("seq_offset"))
      val tmp = new java.io.File(live.getPath + "_tmp")
      Fs.rmTree(tmp)
      repacked.write.mode("overwrite").parquet(tmp.getPath)
      Fs.fsyncTree(tmp)
      java.nio.file.Files.write(markerOf(tmp).toPath, Array.emptyByteArray)
      Fs.fsyncFile(markerOf(tmp)); Fs.fsyncDir(tmp)
      val aside = new java.io.File(live.getPath + "_old")
      Fs.rmTree(aside)
      java.nio.file.Files.move(live.toPath, aside.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      java.nio.file.Files.move(tmp.toPath, live.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Fs.fsyncDir(live.getParentFile)
      Fs.rmTree(aside)
    } finally current.unpersist()
  }

  /** Writer-side healing for a compaction crash (the TokenizerStore
    * recoverCrash shape): live missing + complete (marker-bearing) tmp →
    * finish the publish; live missing + aside → restore the previous
    * generation. Marker-gated promotion is sound because the tmp payload
    * is fsynced before its marker exists.
    */
  private def recoverWindowCrash(live: java.io.File): Unit = {
    val tmp = new java.io.File(live.getPath + "_tmp")
    val aside = new java.io.File(live.getPath + "_old")
    if (!live.exists()) {
      if (markerOf(tmp).exists())
        java.nio.file.Files.move(tmp.toPath, live.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      else if (aside.exists())
        java.nio.file.Files.move(aside.toPath, live.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    if (live.exists()) { Fs.rmTree(tmp); Fs.rmTree(aside) }
  }
}
