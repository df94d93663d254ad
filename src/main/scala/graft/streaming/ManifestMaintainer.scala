package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ManifestPipeline, ServedModel, TokenizerStore}
import graft.util.Fs

/** Streaming maintenance loop for the incremental pre-training manifest
  * (r16 — the feed-driven sibling of the batch `ManifestPipeline` gate,
  * the same role [[AnnIndexMaintainer]] plays for the vector index): a
  * `foreachBatch` sink that folds each micro-batch of NEW documents
  * against the survivor [[UpsertStore]], tokenizes only the genuinely
  * new survivors under the STORED tokenizer, and appends their packed
  * spans as an immutable window directory.
  *
  * STORAGE CONTRACT — ATOMIC-RENAME FILESYSTEMS ONLY (local POSIX,
  * HDFS): every crash-ordering argument below leans on `ATOMIC_MOVE`
  * renames (the `_tmp`/`_old` publish swap, marker restamps, retraction-
  * ledger part publication) and on create-exclusive file semantics. An
  * object store renames by copy+delete, which TEARS those arguments —
  * use [[VersionedManifestMaintainer]] there: the same maintenance
  * surface committed the way the survivor store's own
  * [[ManifestUpsertStore]] commits (immutable generations + one
  * digest-validated conditional-PUT manifest, zero renames).
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
  * MULTI-WRITER (r17, VERDICT r16 #5): a backfill maintainer and a live
  * tailer may share one manifest when (a) their `windowOf` functions map
  * into DISJOINT window spaces, (b) the shared survivor store absorbs
  * concurrent merges (the [[ManifestUpsertStore]] rebase protocol — a
  * rename-based [[UpsertStore]] is single-process-only), and (c) their
  * FEEDS are content-disjoint (e.g. split by crawl shard): two writers
  * folding the SAME new content concurrently each see it absent from
  * their store snapshot and both pack a copy — the store still converges
  * to one key, but both windows carry spans; content-disjoint feeds make
  * the fold exact, not just convergent. A create-exclusive per-window
  * claim (`_claims/window-N`) makes a window-space overlap loud BEFORE
  * spans are written; the committed marker's stamped batchId catches the
  * same violation after commit.
  *
  * MODEL VERSIONING (r17, VERDICT r16 #6): every committed window's
  * marker stamps the content hash of the tokenizer it was packed under;
  * `_MODEL_CURRENT` pins the hash new windows must match, a silent
  * retrain fails loudly, [[adoptModel]] versions the change explicitly,
  * and [[retokenizeWindow]] restores uniform token units per window
  * (from the window's source batch — spans store offsets, not text).
  *
  * {{{
  * val maint = new ManifestMaintainer(store, tokPath, dir,
  *   windowOf = _ + 2, seedOf = bid => 1000L + bid)
  * docs.writeStream.foreachBatch(maint.processBatch _).start()
  * }}}
  */
class ManifestMaintainer(store: KeyedUpsertStore, tokenizerPath: String,
    manifestDir: String, windowOf: Long => Long, seedOf: Long => Long,
    idCol: String = "doc_id", textCol: String = "text",
    budget: Long = 512L, byteLevel: Boolean = false,
    writerId: String = "writer-0") extends Logging {

  require(writerId.nonEmpty && !writerId.exists(c => c == '\n' || c == '\r'),
    s"writerId must be a non-empty single-line token, got '$writerId'")

  // model + hash are ONE cached artifact read (review r17 #3): two
  // independent loads could straddle a racing retrain and pack spans
  // under model B while pinning/stamping hash A — the silent token-unit
  // mix the versioning stamp exists to prevent
  @volatile private var cached: (ServedModel, String) = null

  private def loaded(spark: SparkSession): (ServedModel, String) = {
    if (cached == null)
      cached = TokenizerStore.loadServedWithHash(spark, tokenizerPath)
    cached
  }

  /** The stored model, whatever kind the artifact holds (r17 — the
    * VERDICT r16 #2 seam): unigram serves Viterbi, a BPE/WordPiece merge
    * table serves the compiled greedy fusion; `byteLevel` composes with
    * either, and `ServedBpe + byteLevel` is the literal GPT-family
    * packing unit.
    */
  private def model(spark: SparkSession): ServedModel = loaded(spark)._1

  private def modelHash(spark: SparkSession): String = loaded(spark)._2

  // ── Tokenizer model versioning (VERDICT r16 #6) ─────────────────────────

  private def modelCurrentFile = new java.io.File(manifestDir, "_MODEL_CURRENT")
  private def modelHistoryFile = new java.io.File(manifestDir, "_MODEL_HISTORY")

  /** Refuse to pack under a model the manifest was not versioned to: a
    * silent retrain of the artifact at `tokenizerPath` would mix TOKEN
    * UNITS across windows — window 1 packed under v1 budgets, window 9
    * under v2, span lengths no longer comparable — with no record that
    * it happened. `_MODEL_CURRENT` pins the content hash of the model
    * every new window must be packed under (written with the first
    * batch); a mismatch fails loudly and names the explicit escape
    * hatch, [[adoptModel]].
    */
  private def ensureModelCurrent(spark: SparkSession): Unit = {
    val h = modelHash(spark)
    new java.io.File(manifestDir).mkdirs()
    def mismatch(cur: String): Nothing = throw new IllegalStateException(
      s"tokenizer artifact at $tokenizerPath (content $h) is not the " +
        s"model this manifest is packed under ($cur) — a silent retrain " +
        "would mix token units across windows; call adoptModel() to " +
        "version the change explicitly (and retokenizeWindow(...) per " +
        "window if uniform units are required)")
    if (!modelCurrentFile.exists()) {
      // FIRST-PIN with create-exclusive semantics (review r17 #6): a
      // check-then-replace here would let two writers' first batches pin
      // DIFFERENT models last-wins with no error on either batch
      try {
        java.nio.file.Files.write(modelCurrentFile.toPath,
          h.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        Fs.fsyncFile(modelCurrentFile)
        Fs.fsyncDir(new java.io.File(manifestDir))
        return
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => // lost: compare
      }
    }
    // EMPTY pin = a crashed first-pin (the dirent survived a power cut,
    // the bytes did not). Repairing it with an atomic REPLACE would let
    // two writers racing the repair with DIFFERENT models pin last-wins
    // silently — the exact failure the CREATE_NEW first-pin exists to
    // prevent (ADVICE r17). Instead the debris is GRABBED (rename-to-
    // unique: exactly one racer's ATOMIC_MOVE succeeds) and the winner
    // retries the create-exclusive path; the loser loops and reads the
    // winner's pin like any late writer.
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 5) throw new IllegalStateException(
        s"_MODEL_CURRENT pin under $manifestDir stayed contended across " +
          "5 repair attempts — a writer is flapping the pin; inspect " +
          "manually")
      val cur =
        try java.nio.file.Files.readString(modelCurrentFile.toPath).trim
        catch {
          case _: java.nio.file.NoSuchFileException |
               _: java.io.FileNotFoundException => null // grabbed: re-create
        }
      if (cur == h) return
      if (cur != null && cur.nonEmpty) mismatch(cur)
      // win or lose, the loop retries; the verified grab cannot remove a
      // pin another racer just re-asserted (it restores it instead)
      if (cur != null) grabDebris(modelCurrentFile)(_.trim.isEmpty)
      try {
        java.nio.file.Files.write(modelCurrentFile.toPath,
          h.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        Fs.fsyncFile(modelCurrentFile)
        Fs.fsyncDir(new java.io.File(manifestDir))
        return
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => // lost: re-read
      }
    }
  }

  /** Atomically remove a DEBRIS file so exactly one racer wins the right
    * to re-create it: rename-to-unique is the one primitive where two
    * concurrent callers cannot both succeed (the loser's ATOMIC_MOVE
    * throws NoSuchFile), unlike delete-then-create, where racer B's
    * delete can silently destroy racer A's just-created replacement.
    *
    * Classification happens on a hard-link SNAPSHOT taken BEFORE the
    * move (ADVICE r18): the pre-r19 shape moved first and re-verified
    * the grabbed bytes after, so a crash between the move and the
    * restore lost a racer's just-re-asserted LIVE content from the slot
    * (the both-writers-pack race re-opened). Linking the candidate's
    * inode aside, verifying the snapshot, and only then moving means a
    * crash anywhere BEFORE the move leaves the slot untouched. The move
    * may still catch content a racer re-created between snapshot and
    * move (a different inode — `isSameFile` detects it); that content is
    * restored into the momentarily-empty slot create-exclusively, and a
    * third racer claiming the slot inside that window fails LOUDLY with
    * both files named — never a silent double-owner. Returns whether
    * debris was removed.
    *
    * ACKNOWLEDGED residual crash window (rename protocol; the versioned
    * sibling has no analog): a crash between the move and the
    * isSameFile check leaves the slot empty with the displaced bytes
    * preserved at `.grab-*` — if those bytes were a racer's live
    * re-assert (a two-syscall-wide coincidence, vs. the pre-r19 window
    * spanning a full read-classify cycle), the racer must re-assert;
    * its content is never silently destroyed. `.grab-*`/`.grab-snap-*`
    * files resolve from no lookup — ignorable debris.
    */
  private def grabDebris(f: java.io.File)(
      isDebris: String => Boolean): Boolean = {
    val snap = new java.io.File(f.getParentFile,
      s".grab-snap-${java.util.UUID.randomUUID()}")
    try java.nio.file.Files.createLink(snap.toPath, f.toPath)
    catch {
      case _: java.nio.file.NoSuchFileException |
           _: java.io.FileNotFoundException => return false // already grabbed
    }
    try {
      if (!isDebris(java.nio.file.Files.readString(snap.toPath)))
        return false // live content, slot never touched
      val grabbed = new java.io.File(f.getParentFile,
        s".grab-${java.util.UUID.randomUUID()}")
      try java.nio.file.Files.move(f.toPath, grabbed.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.NoSuchFileException |
             _: java.io.FileNotFoundException => return false // lost the grab
      }
      if (java.nio.file.Files.isSameFile(snap.toPath, grabbed.toPath)) {
        grabbed.delete(); return true // exactly the debris we verified
      }
      try {
        java.nio.file.Files.createLink(f.toPath, grabbed.toPath)
        grabbed.delete()
        false
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"grabbed LIVE content of $f while a third writer re-claimed " +
              s"the slot — the displaced content is preserved at $grabbed; " +
              "reconcile manually (three writers are racing one window/pin, " +
              "which the disjoint-window contract forbids)")
      }
    } finally snap.delete()
  }

  /** Replace `_MODEL_CURRENT` via staged-tmp + atomic rename — the
    * EXPLICIT pin replacement ([[adoptModel]], crashed-pin repair); the
    * first pin uses create-exclusive semantics instead.
    */
  private def writeModelCurrent(h: String): Unit = {
    val tmp = new java.io.File(manifestDir,
      s"_MODEL_CURRENT_tmp-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.writeString(tmp.toPath, h)
    Fs.fsyncFile(tmp)
    java.nio.file.Files.move(tmp.toPath, modelCurrentFile.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Fs.fsyncDir(new java.io.File(manifestDir))
  }

  /** Explicitly version the manifest onto the artifact's CURRENT model:
    * the previous hash is appended to `_MODEL_HISTORY` (fsync-durable,
    * the audit trail), `_MODEL_CURRENT` is atomically replaced, and the
    * in-memory caches drop so the next pack serves the new model. Every
    * window keeps the model stamp it was packed under (in its marker),
    * so a mixed-version manifest is a RECORDED state, not a silent one;
    * [[retokenizeWindow]] restores uniform units window by window.
    * Idempotent: adopting the already-current model is a no-op. A crash
    * between the history append and the current replace replays to a
    * duplicate history line — harmless.
    */
  def adoptModel(spark: SparkSession): Unit = {
    cached = null
    val h = modelHash(spark)
    new java.io.File(manifestDir).mkdirs()
    val prev =
      if (modelCurrentFile.exists())
        Some(java.nio.file.Files.readString(modelCurrentFile.toPath).trim)
      else None
    if (prev.contains(h)) return
    prev.filter(_.nonEmpty).foreach { p =>
      java.nio.file.Files.writeString(modelHistoryFile.toPath, p + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      Fs.fsyncFile(modelHistoryFile)
    }
    writeModelCurrent(h)
  }

  private def windowDir(window: Long) =
    new java.io.File(manifestDir, s"window-$window")

  private def markerOf(dir: java.io.File) =
    new java.io.File(dir, "_WINDOW_COMMITTED")

  // ── Multi-writer window claims (VERDICT r16 #5) ─────────────────────────

  private def claimsDir = new java.io.File(manifestDir, "_claims")
  private def claimOf(window: Long) =
    new java.io.File(claimsDir, s"window-$window")

  /** Create-exclusive window claim, so a backfill maintainer and a live
    * tailer can share one manifest: each writer's `windowOf` must map its
    * batch ids into a DISJOINT window space, and the claim makes a
    * violation LOUD before any spans are written (the committed marker's
    * stamped identity catches the same violation after commit). Claims
    * live OUTSIDE the window dir — the span overwrite would wipe anything
    * inside it.
    *
    * The claim records `writerId\nbatchId` — batchId ALONE is not
    * writer-unique (two misconfigured writers both start at batch 0, and
    * a batchId-only guard would wave the second one through into a
    * concurrent overwrite of the same window dir; review r17 #1). A
    * claim carrying OUR writerId and OUR batchId is our own crashed
    * predecessor (within one writer, the caller — the streaming engine —
    * serializes batches): take over and replay forward. CRASHED-CREATION
    * debris — an EMPTY claim, or a torn one holding only OUR writerId
    * line (the dirent survived a power cut, the content bytes only
    * partially; content from a live foreign writer is visible the
    * instant its write() returns) — is NOT taken over in place (ADVICE
    * r17: two writers racing the same debris would both classify it as
    * 'ours' and pack concurrently, defeating the mutual exclusion):
    * it is atomically GRABBED ([[grabDebris]] — exactly one racer's
    * rename succeeds) and the winner re-runs the create-exclusive path,
    * so ownership is RE-ASSERTED with full content before any pack; the
    * loser re-reads the winner's claim and fails loud like any foreign
    * writer. A torn claim holding only a FOREIGN writerId line is
    * foreign. Anything else throws; [[reclaimWindow]] is the admin
    * release for a dead owner's claim.
    */
  private def acquireClaim(window: Long, batchId: Long): Unit = {
    claimsDir.mkdirs()
    val claim = claimOf(window)
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 5) throw new IllegalStateException(
        s"window $window claim stayed contended across 5 acquisition " +
          s"attempts by writer '$writerId' batch $batchId — a writer is " +
          "flapping the claim; inspect _claims manually")
      try {
        java.nio.file.Files.write(claim.toPath,
          s"$writerId\n$batchId"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        Fs.fsyncFile(claim)
        Fs.fsyncDir(claimsDir)
        return
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
      }
      val lines =
        try java.nio.file.Files.readString(claim.toPath)
          .linesIterator.map(_.trim).toSeq
        catch {
          case _: java.nio.file.NoSuchFileException |
               _: java.io.FileNotFoundException => null // grabbed: retry
        }
      if (lines != null) {
        if (lines.headOption.contains(writerId) &&
            lines.drop(1).headOption.contains(batchId.toString))
          return // our crashed predecessor, full content: take over as-is
        val debris = lines.isEmpty ||
          (lines.size == 1 && lines.headOption.contains(writerId))
        if (!debris)
          throw new IllegalStateException(
            s"window $window is claimed by writer " +
              s"'${lines.headOption.getOrElse("")}' batch " +
              s"${lines.drop(1).headOption.getOrElse("?")} while writer " +
              s"'$writerId' batch $batchId is trying to pack it — two " +
              "maintainers' windowOf spaces overlap (multi-writer " +
              "maintenance requires windows from DISJOINT batch-id " +
              "spaces) or a foreign writer is racing this window; if the " +
              "owner is dead, call reclaimWindow(window, force = true) " +
              "to release it")
        // win or lose, the loop re-asserts from scratch; the verified
        // grab restores (rather than removes) a claim that a racing
        // writer re-asserted between our read and our grab
        grabDebris(claim) { c =>
          val ls = c.linesIterator.map(_.trim).toSeq
          ls.isEmpty || (ls.size == 1 && ls.headOption.contains(writerId))
        }
      }
    }
  }

  /** Admin release of a DEAD writer's claim (VERDICT r17 #4 — the manual
    * "remove its claim file" step, made safe). No `autoReclaimAfterMs`
    * lease exists here DELIBERATELY (contrast
    * [[VersionedManifestMaintainer]], r19): the versioned sibling's
    * conditional manifest PUT is a second, commit-time mutual exclusion
    * that turns a mistaken auto-reclaim of a live owner into one loud
    * commit error — in this rename protocol the claim is the ONLY fence,
    * so an automated reclaim of a slow-but-live owner would let two
    * writers overwrite one window dir concurrently with no commit-time
    * backstop. The human `force = true` assertion IS the safety here.
    *
    * A maintainer that crashed
    * mid-pack leaves its claim blocking every other writer's replay of
    * that window. Reclaiming a claim on an already-COMMITTED window needs
    * no force (the marker guards it — the claim is spent debris); an
    * UNCOMMITTED claim requires `force = true`, because a LIVE owner
    * mid-pack would race the reclaim — the caller asserts the owner is
    * dead. The removal is the atomic [[grabDebris]] rename, so two
    * concurrent reclaims cannot both "succeed" into re-creating state.
    * After the reclaim, a replacement writer replaying the window's batch
    * completes it without double-packing: spans land at the window's
    * deterministic dir (overwritten if the dead writer half-wrote them),
    * and an already-merged store folds the replay's fresh set to empty —
    * the standard crash-forward path. Returns whether a claim was
    * removed.
    */
  def reclaimWindow(window: Long, force: Boolean = false): Boolean = {
    val claim = claimOf(window)
    if (!claim.exists()) return false
    // the admin asserts the claim is releasable whatever it holds — the
    // verified-grab restore path does not apply to an explicit reclaim
    if (markerOf(windowDir(window)).exists())
      return grabDebris(claim)(_ => true)
    require(force,
      s"window $window has an UNCOMMITTED claim — reclaiming it while " +
        "its owner is alive would let two writers pack the window " +
        "concurrently; pass force = true only after confirming the " +
        "owner is dead")
    grabDebris(claim)(_ => true)
  }

  /** Test seam: runs after [[acquireClaim]] succeeds and before any span
    * write — the window a concurrent writer must land in to exercise the
    * claim fence deterministically. No-op in production.
    */
  protected def afterClaim(): Unit = {}

  /** The batchId recorded inside a committed window's marker, or None for
    * a marker that records none (a pre-r17 window). Marker format:
    * line 1 = committing batchId, line 2 = content hash of the tokenizer
    * model the window's spans were packed under (the version stamp).
    */
  private def markerBatchId(marker: java.io.File): Option[Long] = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(marker.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    // parse the RAW first line, not the trimmed content: a marker whose
    // first line is empty (a pre-r17 window later rewritten with a model
    // stamp) must read as "no recorded batchId", not as an attempt to
    // parse the second line's hash as a number
    txt.linesIterator.toSeq.headOption.map(_.trim)
      .filter(_.matches("-?\\d+")).map(_.toLong)
  }

  /** The model stamp of a committed window — which tokenizer version its
    * spans count tokens under. None for a pre-r17 marker.
    */
  def windowModelStamp(windowId: Long): Option[String] = {
    val marker = markerOf(windowDir(windowId))
    require(marker.exists(), s"window $windowId is not committed")
    val lines = new String(
      java.nio.file.Files.readAllBytes(marker.toPath),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
    lines.drop(1).headOption.map(_.trim).filter(_.nonEmpty)
  }

  /** The writer that committed a window (marker line 3), None when
    * unrecorded (an older marker).
    */
  private def markerWriter(marker: java.io.File): Option[String] = {
    val lines = new String(
      java.nio.file.Files.readAllBytes(marker.toPath),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
    lines.drop(2).headOption.map(_.trim).filter(_.nonEmpty)
  }

  /** Apply one micro-batch of raw (curated) documents. Also usable
    * un-streamed (backfills, replays, tests).
    *
    * The committed-window short-circuit is keyed on the COMMITTING
    * batchId, stamped into the marker — not on the window id alone: if
    * `windowOf` maps two distinct batch ids to one window (nothing can
    * enforce injectivity on a constructor function), the second batch
    * must fail LOUDLY rather than be silently dropped with its documents
    * never reaching the store or the manifest (ADVICE r16). A replay of
    * the SAME batchId still no-ops.
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
      markerBatchId(marker).filter(_ != batchId).foreach { committed =>
        throw new IllegalStateException(
          s"batch $batchId maps to window $window, already committed by " +
            s"batch $committed — windowOf is not injective; this batch's " +
            "documents would be silently lost")
      }
      // batchId matches, but batchId alone is not writer-unique: two
      // misaligned writers both start at batch 0, and the second one's
      // DIFFERENT documents must not silently skip (review r17 #1)
      markerWriter(marker).filter(_ != writerId).foreach { committer =>
        throw new IllegalStateException(
          s"window $window was committed by writer '$committer' at the " +
            s"same batch id $batchId that writer '$writerId' now maps " +
            "there — two maintainers' windowOf spaces overlap; this " +
            "batch's documents would be silently lost")
      }
      logInfo(s"batch $batchId: window $window already committed, skipping")
      claimOf(window).delete() // sweep a claim a crash left behind
      return
    }
    ensureModelCurrent(spark) // refuse a silently-retrained tokenizer
    acquireClaim(window, batchId) // one writer per window, loudly
    afterClaim()
    val fresh = ManifestPipeline.freshSurvivors(store, batch, idCol, textCol)
    try {
      if (fresh.isEmpty) {
        // either a legitimately all-duplicate batch (no dir ever written)
        // or a crash between merge and marker (dir holds the spans):
        // both complete by committing the window as-is
        dir.mkdirs()
      } else {
        val packed = ManifestPipeline
          .packWindow(fresh, idCol, textCol, model(spark), window,
            seedOf(batchId), budget, byteLevel)
        packed.write.mode("overwrite").parquet(dir.getPath)
        // free the pack kernel's internal checkpoint blocks promptly —
        // a long-running stream must not wait for a driver GC (r19)
        graft.util.Checkpoints.release(packed)
        Fs.fsyncTree(dir) // spans durable BEFORE the store learns the keys
        // non-empty was already probed above — skip the second emptiness
        // job over the same checkpointed frame (r20)
        ManifestPipeline.mergeSurvivorsNonEmpty(store, fresh, idCol,
          txnId = batchId)
      }
      java.nio.file.Files.write(marker.toPath,
        s"$batchId\n${modelHash(spark)}\n$writerId"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Fs.fsyncFile(marker)
      Fs.fsyncDir(dir)
      claimOf(window).delete() // marker now guards; the claim is done
    } finally graft.util.Checkpoints.release(fresh)
    // ^ actually frees the checkpoint blocks: Dataset.unpersist is a
    //   cache-manager call and is a NO-OP on a localCheckpoint'd frame
    //   (ADVICE r16) — a long stream must not pin every batch's blocks
    //   until a driver GC happens to run
  }

  /** All committed windows' spans (uncommitted window dirs are excluded —
    * a reader never observes a half-delivered window), with RETRACTED
    * documents filtered out: the manifest's merge-on-read rule. A
    * retraction is visible to every reader the moment its ledger entry
    * is durable; [[compactWindow]] later restores the packing invariant
    * physically.
    */
  def readManifest(spark: SparkSession): DataFrame = {
    val spans = rawCommittedSpans(spark)
    retractedIds(spark) match {
      case Some(ids) =>
        spans.join(org.apache.spark.sql.functions.broadcast(ids),
          Seq(idCol), "left_anti")
      case None => spans
    }
  }

  /** Committed spans WITHOUT the retraction filter — the writer-side
    * view [[compactRetracted]] sweeps over (a reader wanting the logical
    * manifest uses [[readManifest]]). Same crash checks as the reader.
    */
  private def rawCommittedSpans(spark: SparkSession): DataFrame = {
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
    if (dirs.isEmpty) emptySpans(spark)
    else spark.read.parquet(dirs: _*)
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
    // STAGE-THEN-PUBLISH (ADVICE r16): a bare append into the live ledger
    // dir could crash mid-write and leave a torn parquet part that makes
    // every later readManifest/compactWindow throw until manual cleanup.
    // Spark writes the entry into a staging dir readers never list
    // (underscore-prefixed, so the committed-window scan skips it), the
    // payload is fsynced THERE, and each part file enters the live dir by
    // atomic rename — the same data-durable-before-visibility ordering as
    // the window commit. A crash between renames leaves a PREFIX of the
    // entry's parts visible, and the caller re-runs retract — retraction
    // is an idempotent set-union, so re-adding ids is harmless. A crashed
    // call's stage dir is IGNORABLE debris (no reader lists it) and is
    // deliberately NOT swept here: a blanket sweep would delete a
    // CONCURRENT retract's in-flight stage and let that call return
    // success having published nothing — a silently lost takedown
    // (review r17 #2); the loud guard below is the backstop.
    val stage = new java.io.File(manifestDir,
      s"_retractions_stage-${java.util.UUID.randomUUID()}")
    try {
      ids.select(idCol).distinct()
        .coalesce(1) // ledger entries are takedown-batch-sized
        .write.mode("overwrite").parquet(stage.getPath)
      Fs.fsyncTree(stage)
      val parts = Option(stage.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      if (parts.isEmpty) throw new IllegalStateException(
        s"retraction stage $stage produced no parquet part — the stage " +
          "was removed out from under this call (or the write failed); " +
          "the ledger entry was NOT published, re-run retract")
      parts.zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.move(p.toPath,
          new java.io.File(retractionsDir,
            s"retract-${stage.getName.stripPrefix("_retractions_stage-")}-$i.parquet").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      Fs.fsyncDir(retractionsDir)
    } finally Fs.rmTree(stage) // our OWN stage only
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
      // pinned like packWindow's shuffled frame (r20, VERDICT r19 #7):
      // packSpans references its input across TWO actions (the eager
      // approxQuantile at plan construction plus the publish write), and
      // each re-ran the shuffle + anti-join subtree from current's blocks
      val shuf = graft.operators.Sampling.shuffled(remaining, idCol, seed)
        .localCheckpoint(true)
      try {
        val repacked = graft.operators.Shards.packSpans(shuf,
            "shuffle_pos", "n_tok", budget)
          .withColumn("window", lit(windowId))
          .select(col("window"), col(idCol), col("shuffle_pos"), col("n_tok"),
            col("cum_before"), col("seq"), col("tok_start"), col("tok_end"),
            col("seq_offset"))
        // the compacted generation keeps the ORIGINAL marker content
        // (committing batchId + model stamp) — compaction rewrites spans,
        // it does not re-deliver a batch or change token units, and the
        // non-injectivity guard in processBatch keys on this content
        publishWindow(live, repacked,
          java.nio.file.Files.readAllBytes(markerOf(live).toPath))
      } finally graft.util.Checkpoints.release(shuf)
    } finally graft.util.Checkpoints.release(current) // see processBatch
  }

  /** Stage-and-swap publish of a window REWRITE ([[compactWindow]] /
    * [[retokenizeWindow]]): staged tmp with the payload fsynced BEFORE
    * its marker exists, retire live aside, atomic publish, debris
    * cleared — the TokenizerStore retire-aside protocol;
    * [[recoverWindowCrash]] heals any interruption point. Rewrites are
    * SINGLE-OPERATOR operations (the TokenizerStore contract): two
    * concurrent rewrites of the same window race the well-known `_tmp`
    * path — the loser's write or swap throws (loud, never silent), and
    * the winner's generation is intact. The per-window claims guard
    * `processBatch` appends only; serialize maintenance externally.
    */
  private def publishWindow(live: java.io.File, repacked: DataFrame,
      markerBytes: Array[Byte]): Unit = {
    val tmp = new java.io.File(live.getPath + "_tmp")
    Fs.rmTree(tmp)
    repacked.write.mode("overwrite").parquet(tmp.getPath)
    Fs.fsyncTree(tmp)
    java.nio.file.Files.write(markerOf(tmp).toPath, markerBytes)
    Fs.fsyncFile(markerOf(tmp)); Fs.fsyncDir(tmp)
    val aside = new java.io.File(live.getPath + "_old")
    Fs.rmTree(aside)
    java.nio.file.Files.move(live.toPath, aside.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(tmp.toPath, live.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Fs.fsyncDir(live.getParentFile)
    Fs.rmTree(aside)
  }

  /** Physically re-pack one committed window under the manifest's
    * CURRENT model — the uniform-units restore after [[adoptModel]].
    * Stored spans hold token OFFSETS, not text, so re-tokenization
    * structurally requires the window's source batch: the caller
    * supplies it, and any window document missing from it fails loudly.
    * (The alternative — packing a per-model-version n_tok into every
    * span row — would tax every window of every manifest for a rare
    * event; requiring the source batch at the rare event is the
    * documented trade.) Retracted documents drop during the rewrite,
    * like compaction; the rewrite keeps the window's original committing
    * batchId and stamps the NEW model hash; the publish is the same
    * retire-aside crash protocol as [[compactWindow]].
    */
  def retokenizeWindow(spark: SparkSession, windowId: Long,
      sourceBatch: DataFrame, seed: Long): Unit = {
    import org.apache.spark.sql.functions._
    val live = windowDir(windowId)
    recoverWindowCrash(live)
    require(markerOf(live).exists(), s"window $windowId is not committed")
    ensureModelCurrent(spark)
    if (!live.listFiles().exists(_.getName.endsWith(".parquet"))) {
      // a committed-but-spanless window (an all-duplicate batch) has no
      // spans to re-pack, but its marker must still RESTAMP the adopted
      // model (ADVICE r17): a silent early return here would leave
      // windowModelStamp reporting the old hash after a full retokenize
      // pass, contradicting the uniform-units-restored record
      restampMarker(spark, live)
      return
    }
    val idsAll = spark.read.parquet(live.getPath)
      .select(col(idCol)).distinct()
      .localCheckpoint(true) // decouple from the files the swap replaces
    try {
      // retracted docs are dropped by the rewrite anyway, so they must
      // not count as "missing" — a caller who legally DELETED a
      // taken-down text cannot be required to supply it (review r17 #4)
      val ids = retractedIds(spark) match {
        case Some(r) => idsAll.join(broadcast(r), Seq(idCol), "left_anti")
        case None => idsAll
      }
      // pinned: the missing-count action below AND packWindow's
      // tokenization both read this frame — without the checkpoint the
      // source batch's scan+dedup+join executed twice (r19). Released in
      // a finally (r20, ADVICE r19 #3): a failed require/publish must
      // not leak the blocks until a driver GC.
      val kept = sourceBatch.select(col(idCol), col(textCol))
        .dropDuplicates(Seq(idCol))
        .join(ids, Seq(idCol))
        .localCheckpoint(true)
      try {
        val missing = ids
          .join(kept.select(col(idCol)), Seq(idCol), "left_anti").count()
        require(missing == 0L,
          s"$missing of window $windowId's documents are missing from the " +
            "supplied source batch — spans store token offsets, not text; " +
            "re-tokenization needs the window's original batch")
        val repacked = ManifestPipeline.packWindow(kept, idCol, textCol,
          model(spark), windowId, seed, budget, byteLevel)
        publishWindow(live, repacked, restampedMarker(spark, live))
      } finally graft.util.Checkpoints.release(kept)
    } finally graft.util.Checkpoints.release(idsAll)
  }

  /** The window's marker content with line 2 replaced by the CURRENT
    * model hash — the re-tokenize restamp. Lines 1 and 3 are preserved
    * verbatim: a rewrite changes token units, not the committing batch or
    * its ownership — and an UNRECORDED writer (a pre-r17 marker's absent
    * third line) stays unrecorded (ADVICE r17: adopting the
    * re-tokenizer's writerId would make a later legitimate at-least-once
    * replay of that window's batch by a differently-named maintainer
    * throw instead of no-op).
    */
  private def restampedMarker(spark: SparkSession,
      live: java.io.File): Array[Byte] = {
    val marker = markerOf(live)
    val batchStamp = markerBatchId(marker).map(_.toString).getOrElse("")
    val writerStamp = markerWriter(marker).getOrElse("")
    s"$batchStamp\n${modelHash(spark)}\n$writerStamp"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Rewrite a committed window's marker in place with the current model
    * stamp (staged tmp + atomic rename — a torn in-place write could
    * momentarily lose the marker and de-commit the window to readers).
    */
  private def restampMarker(spark: SparkSession, live: java.io.File): Unit = {
    val bytes = restampedMarker(spark, live)
    val tmp = new java.io.File(live,
      s".marker-tmp-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp.toPath, bytes)
    Fs.fsyncFile(tmp)
    java.nio.file.Files.move(tmp.toPath, markerOf(live).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Fs.fsyncDir(live)
  }

  /** The takedown SWEEP (VERDICT r16 #3): one pass over the committed
    * spans finds every window still physically holding a retracted
    * document, then compacts each — [[retract]] writes the ledger once,
    * this restores the packing invariant across the WHOLE manifest
    * instead of asking the operator to name windows by hand. `seedOf`
    * maps each affected window to its re-pack shuffle seed (a real
    * deployment keeps the window's original seed so the re-pack is the
    * deterministic dense order the window would have had). Idempotent
    * and crash-forward: each window's compaction is its own retire-aside
    * publish ([[compactWindow]] heals a crashed predecessor on entry and
    * no-ops a clean window), so a sweep that dies mid-way simply re-runs.
    * Returns the window ids it compacted. The driver-side collect is the
    * AFFECTED WINDOW ID list — takedown-sized, like the ledger itself.
    */
  def compactRetracted(spark: SparkSession,
      seedOf: Long => Long): Seq[Long] = {
    import org.apache.spark.sql.functions._
    // heal crashed compactions FIRST: a sweep that died mid-publish must
    // replay forward from its own debris, not fail the committed-spans
    // read the way a plain reader (correctly) does
    Option(new java.io.File(manifestDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        (d.getName.endsWith("_tmp") || d.getName.endsWith("_old")))
      .map(_.getName.stripSuffix("_tmp").stripSuffix("_old"))
      .distinct.filter(_.startsWith("window-"))
      .foreach(n => recoverWindowCrash(new java.io.File(manifestDir, n)))
    val retracted = retractedIds(spark)
    if (retracted.isEmpty) return Seq.empty
    // "nothing committed yet" means nothing to sweep, not an error —
    // retract() has no committed-window precondition (review r17 #7)
    if (!Option(new java.io.File(manifestDir).listFiles())
        .getOrElse(Array.empty)
        .exists(d => d.isDirectory && !d.getName.startsWith("_") &&
          !d.getName.endsWith("_tmp") && !d.getName.endsWith("_old") &&
          markerOf(d).exists())) return Seq.empty
    val affected = rawCommittedSpans(spark)
      .join(broadcast(retracted.get), Seq(idCol), "left_semi")
      .select(col("window")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    affected.foreach(w => compactWindow(spark, w, seedOf(w)))
    affected
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
