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
    val marker = markerOf(dir)
    if (marker.exists()) {
      logInfo(s"batch $batchId: window $window already committed, skipping")
      return
    }
    val fresh = ManifestPipeline.freshSurvivors(store, batch, idCol, textCol)
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
  }

  /** All committed windows' spans (uncommitted window dirs are excluded —
    * a reader never observes a half-delivered window).
    */
  def readManifest(spark: SparkSession): DataFrame = {
    val dirs = Option(new java.io.File(manifestDir).listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory && markerOf(d).exists() &&
        d.listFiles().exists(_.getName.endsWith(".parquet")))
      .map(_.getPath)
    require(dirs.nonEmpty, s"no committed manifest windows under $manifestDir")
    spark.read.parquet(dirs: _*)
  }
}
