package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Cdc

/** Thrown when a manifest commit loses the conditional-PUT race to another
  * writer (the Iceberg/Delta optimistic-concurrency conflict): the caller
  * re-reads the current manifest and retries its commit on top, or
  * surfaces the conflict.
  */
class CommitConflictException(msg: String) extends IllegalStateException(msg)

/** The keyed-replica surface [[CdcStreamJob]] drives — implemented by both
  * commit protocols ([[UpsertStore]] for atomic-rename filesystems,
  * [[ManifestUpsertStore]] for object-store semantics), so the streaming
  * loop, its ledger contract, and its maintenance policies are protocol-
  * agnostic: swapping the storage backend is a constructor argument, not a
  * topology change.
  */
trait KeyedUpsertStore {
  /** Replace the store's contents with an initial load (bootstrap). */
  def initialize(initialLoad: DataFrame): Unit
  /** Apply one folded CDC batch (idempotent, last-write-wins by PK). */
  def merge(folded: DataFrame): Unit
  /** Current store contents (no envelope columns). */
  def snapshot(): DataFrame
  /** Monotone feed position for change-data-feed consumers: the newest
    * delta seq (rename-based store) or the manifest version (object-store
    * commit protocol). [[StoreChangeFeed]] tails either protocol through
    * this pair of methods (r13 — the consumer is protocol-agnostic).
    */
  def feedVersion: Long
  /** CDF envelope rows (payload + `_change_type`) in `(from, to]` of the
    * [[feedVersion]] history; LWW-applying them takes the `from` snapshot
    * to the `to` snapshot. Refuses loudly behind the retention horizon.
    */
  def changesBetween(from: Long, to: Long): DataFrame
  /** Compact when the delta-count debt reaches the threshold; returns
    * whether a compaction ran.
    */
  def compactIfNeeded(maxDeltas: Int = 16): Boolean
  /** Byte-ratio sibling (delta bytes / base bytes); returns whether a
    * compaction ran.
    */
  def compactIfDeltaRatio(maxRatio: Double = 0.2): Boolean
}

/** OBJECT-STORE-SEMANTICS sibling of [[UpsertStore]] (VERDICT r9 #9): the
  * same keyed MOR store, committed WITHOUT a single rename.
  *
  * [[UpsertStore]]'s staged-swap protocol is correct on filesystems where
  * rename is atomic (local POSIX, HDFS); an object store renames by
  * copy+delete, which tears every one of its crash-ordering arguments.
  * This class uses the commit protocol object stores actually support —
  * the Iceberg/Delta shape:
  *
  *  - DATA is immutable: every write lands in a fresh `gen-<v>/` directory
  *    that no later operation ever mutates, moves, or overwrites. Crash
  *    mid-write leaves an unreferenced (invisible) partial dir, never a
  *    torn referenced one.
  *  - VISIBILITY is one small file: `manifest-<v%012d>.json` names, for
  *    each bucket, the base generation dir that serves it, plus the
  *    ordered delta dirs. Readers list manifests and serve the HIGHEST
  *    COMPLETE version. Publishing a commit = putting ONE new manifest
  *    object; nothing is renamed, nothing existing is touched.
  *  - TORN-WRITE DEFENSE: a real object store makes the manifest PUT
  *    atomic; a plain filesystem does not, so each manifest embeds a
  *    SHA-256 of its own payload and readers SKIP any manifest whose
  *    digest fails — a torn newest manifest degrades to "commit never
  *    happened" (the previous version serves), never to a torn store.
  *    The spec drives exactly this: truncated/corrupted newest manifests
  *    at every length.
  *  - GC is safe-by-construction: only generation dirs referenced by NO
  *    retained manifest are deleted, and deletion happens strictly AFTER
  *    the new manifest is readable, so a crash anywhere in GC leaves
  *    garbage (retryable), never a dangling reference. `keepVersions`
  *    manifests are retained — they ARE the time-travel history
  *    ([[snapshotAt]]), exactly Iceberg's snapshot-expiry model.
  *
  * Same semantics as the MOR [[UpsertStore]]: last-write-wins by (pk, max
  * seq), deletes as 'D' marker rows folded at read, bucket-pruned point
  * lookups, bucket-selective compaction (only buckets the deltas touch
  * get a new base generation; untouched buckets keep their old gen dirs
  * byte-identical — the r10 compaction selectivity carries over for
  * free, because "don't rewrite" here means "reference the same immutable
  * dir again").
  *
  * Multi-writer safety is OPTIMISTIC CONCURRENCY on the manifest slot
  * (the Iceberg commit model): each commit claims its version number with
  * a conditional create — the local-FS `CREATE_NEW` here, the
  * `If-None-Match` PUT on S3 — so two writers racing the same next
  * version produce exactly one winner; the loser throws
  * [[CommitConflictException]] with nothing published (its generation dir
  * is unreferenced garbage the next GC sweeps) and retries on top of the
  * winner's manifest. The reference's topology is single-writer anyway
  * (one producer per replica, `S4HanaProducer.java:392-469`); the fence
  * turns a misconfigured second writer from silent corruption into a loud
  * retryable error.
  */
/** @param orphanGraceMs unreferenced generation dirs younger than this are
  *   NOT garbage-collected: an unreferenced dir may be a CONCURRENT
  *   writer's in-flight commit (its manifest put comes after the data
  *   write), and sweeping it mid-write corrupts that writer's job — found
  *   by the race spec. Age is the only signal an object store offers for
  *   the distinction (Iceberg's remove_orphan_files ships the same
  *   defense, defaulting to days); a crashed writer's orphan just waits
  *   out the grace before the next GC reclaims it. A writer that LOSES
  *   the commit race deletes its own generation immediately — the grace
  *   only covers crashes. Age is the NEWEST mtime in the dir tree (a
  *   dir's own mtime is set at job START, and a long parquet write would
  *   look stale by its root alone — review r10), and the default is a
  *   day, sized for multi-hour backfill writes at the 100 TB target, not
  *   for laptop jobs.
  */
class ManifestUpsertStore(spark: SparkSession, dir: String,
    pkCols: Seq[String], numBuckets: Int = 16, keepVersions: Int = 3,
    orphanGraceMs: Long = 24 * 3600 * 1000L)
    extends KeyedUpsertStore {

  // retention counts COMPLETE manifests (torn slot-burners are ignored by
  // gc()'s window), so >= 2 simply guarantees one version of time-travel
  // slack behind the serving manifest at all times
  require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")

  private val bucketCol = "_bucket"
  private val seqCol = "_graft_seq"

  private def root = new java.io.File(dir)

  // ── Manifest encoding ────────────────────────────────────────────────────

  /** @param base   bucket id → generation dir name serving that bucket
    * @param deltas (seq, generation dir name), ascending
    * @param floorSeq highest delta seq ever folded into the base — the
    *   compaction floor the next merge's seq must clear. Recorded IN the
    *   manifest (review r10): deriving it from `-compactN-` generation
    *   names regressed when a compaction's touched buckets were all
    *   emptied by deletes (no surviving compact-tagged gen → floor fell
    *   back to a stale value → the next merge REUSED an already-folded
    *   seq, silently corrupting changesBetween and LWW ties).
    */
  private case class Manifest(version: Long, schemaJson: String,
      base: Map[Int, String], deltas: Seq[(Long, String)],
      floorSeq: Long = 0L)

  // ObjectMapper is thread-safe after construction and expensive to build —
  // one instance per store, not one per encode/decode (review r10)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def manifestName(v: Long): String = f"manifest-$v%012d.json"

  /** Serialize with an embedded payload digest: the LAST thing appended,
    * so any torn prefix fails validation.
    */
  private def encodeManifest(m: Manifest): Array[Byte] = {
    val node = mapper.createObjectNode()
    node.put("version", m.version)
    node.put("floorSeq", m.floorSeq)
    node.put("schema", m.schemaJson)
    val b = node.putObject("base")
    m.base.toSeq.sortBy(_._1).foreach { case (k, v) => b.put(k.toString, v) }
    val d = node.putArray("deltas")
    m.deltas.foreach { case (s, g) =>
      val e = d.addObject(); e.put("seq", s); e.put("gen", g)
    }
    val payload = mapper.writeValueAsString(node)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"$payload\n$digest\n".getBytes(StandardCharsets.UTF_8)
  }

  /** None when torn/corrupt — the reader's skip signal. */
  private def decodeManifest(bytes: Array[Byte]): Option[Manifest] =
    try {
      val s = new String(bytes, StandardCharsets.UTF_8)
      val nl = s.lastIndexOf('\n', s.length - 2)
      if (nl < 0) return None
      val payload = s.substring(0, nl)
      val digest = s.substring(nl + 1).trim
      val want = java.security.MessageDigest.getInstance("SHA-256")
        .digest(payload.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      if (digest != want) return None
      val n = mapper.readTree(payload)
      val base = {
        val bn = n.get("base")
        val it = bn.fieldNames()
        val buf = scala.collection.mutable.Map.empty[Int, String]
        while (it.hasNext) {
          val k = it.next(); buf(k.toInt) = bn.get(k).asText()
        }
        buf.toMap
      }
      val deltas = (0 until n.get("deltas").size()).map { i =>
        val e = n.get("deltas").get(i)
        (e.get("seq").asLong(), e.get("gen").asText())
      }
      Some(Manifest(n.get("version").asLong(), n.get("schema").asText(),
        base, deltas,
        Option(n.get("floorSeq")).map(_.asLong()).getOrElse(0L)))
    } catch { case _: Exception => None }

  /** All manifest files, descending by version (by NAME — the zero-padded
    * number makes lexical order numeric, the object-store LIST trick).
    */
  private def manifestFiles(): Seq[java.io.File] =
    Option(root.listFiles((_: java.io.File, n: String) =>
      n.matches("manifest-\\d{12}\\.json")))
      .getOrElse(Array.empty[java.io.File]).sortBy(_.getName).reverse.toSeq

  /** The newest COMPLETE manifest: torn/corrupt ones (a crashed or
    * in-flight PUT) are skipped, older complete versions serve.
    */
  private def currentManifest(): Manifest =
    manifestFiles().iterator
      .flatMap(tryReadManifest)
      .nextOption()
      .getOrElse(throw new IllegalStateException(
        s"store $dir has no complete manifest (not initialized, or every " +
          "manifest is torn)"))

  private def manifestAt(version: Long): Manifest =
    manifestFiles().iterator
      .flatMap(tryReadManifest)
      .find(_.version == version)
      .getOrElse(throw new IllegalStateException(
        s"store $dir: version $version is not retained (keepVersions=" +
          s"$keepVersions) or never existed"))

  /** Publish via CONDITIONAL create — the S3 `If-None-Match` PUT (the
    * commit primitive Iceberg/Delta builds optimistic concurrency on): the
    * version slot is claimed create-exclusive, so two writers racing the
    * same next version produce exactly ONE winner; the loser gets
    * [[CommitConflictException]], re-reads the new current manifest, and
    * retries its commit on top (or surfaces the conflict).
    *
    * An OCCUPIED slot always conflicts — even a torn occupant. Nothing is
    * EVER overwritten: the r10 review showed an "replace torn debris"
    * branch lets two writers that both observe the same torn slot both
    * succeed (one unconditional write clobbering the other — a silent lost
    * commit). Instead a torn occupant simply burns its version number:
    * readers skip torn files by digest, [[nextVersion]] counts them, and
    * version-number GAPS are part of the format's contract. GC removes
    * aged torn debris.
    *
    * The publish is CONTENT-ATOMIC (r14): the manifest bytes are written
    * and forced into a dot-staging file OUTSIDE the `manifest-*` listing
    * namespace, then the slot is claimed by hard-LINKING the staging file
    * in — link creation is atomic and create-exclusive, so the slot's
    * FULL content is present at the instant its name becomes visible,
    * exactly like an object store's conditional PUT. The previous
    * emulation (claim the slot with CREATE_NEW, then write+force into it)
    * had a lost-update race the three-writer stress caught flaking: a
    * concurrent writer listing during the in-flight put saw the newest
    * slot as a TORN file, burned it, built its commit on the PREVIOUS
    * manifest, and published one slot past the victim — both writers
    * reported success, but the victim's delta was referenced by no
    * retained manifest and its batch silently vanished. Torn-visible
    * in-flight commits are now impossible; a torn manifest can only be
    * pre-existing crash debris, and the burn rule remains for that. A
    * crash between write and link leaves an invisible staging file (GC
    * sweeps it aged); a crash after link is a completed commit.
    */
  private def putManifest(m: Manifest): Unit = {
    // the shared content-atomic conditional-create (graft.util
    // .ConditionalPut, extracted r18): staged forced write + create-
    // exclusive hard link, durability-before-visibility (ADVICE r10)
    val f = new java.io.File(root, manifestName(m.version))
    if (!graft.util.ConditionalPut.claim(f, encodeManifest(m)))
      throw new CommitConflictException(
        s"store $dir: version slot ${m.version} is occupied (a committed " +
          "manifest, or a crashed writer's torn put) — re-read the " +
          "current manifest and retry on top; torn slots burn their " +
          "version number")
    // ... and persist the manifest's DIRECTORY ENTRY: without this a crash
    // can lose the just-created name even with its bytes forced, silently
    // dropping a CDC window whose ledger already advanced (ADVICE r10)
    graft.util.Fs.fsyncDir(root)
  }

  /** Read a manifest file, tolerating it VANISHING between list and read:
    * the single writer's gc() deletes retired complete manifests and aged
    * torn debris while concurrent READERS (the multi-reader topology this
    * protocol serves) are iterating the same listing — a vanished file is
    * treated exactly like a torn one, skip and continue (ADVICE r10).
    */
  private def tryReadManifest(f: java.io.File): Option[Manifest] =
    try decodeManifest(java.nio.file.Files.readAllBytes(f.toPath))
    catch {
      case _: java.nio.file.NoSuchFileException |
           _: java.io.FileNotFoundException => None
    }

  /** The next free version slot: one past the highest manifest FILE
    * (complete or torn — torn puts burn their number, see [[putManifest]]).
    */
  private def nextVersion(): Long =
    manifestFiles().headOption
      .map(_.getName.stripPrefix("manifest-").stripSuffix(".json").toLong + 1)
      .getOrElse(1L)

  /** ONE list pass → (newest complete manifest, next free version slot).
    * The pair MUST come from a single listing: the conditional PUT only
    * fences commits that target the SAME slot, so a writer that re-listed
    * between reading the manifest and choosing its slot could observe an
    * interleaved commit in the second listing only — and would then PUT
    * one slot past it, succeeding while silently DROPPING that commit's
    * deltas from its own manifest (found building the r11 rebase spec).
    * From one listing, any commit that lands after it necessarily
    * occupies a slot >= ours (slots are claimed one past the highest
    * *visible* file, and files are never removed from the top), so our
    * PUT conflicts instead of skipping.
    */
  private def currentState(): (Manifest, Long) = {
    val files = manifestFiles()
    val next = files.headOption
      .map(_.getName.stripPrefix("manifest-").stripSuffix(".json").toLong + 1)
      .getOrElse(1L)
    val m = files.iterator.flatMap(tryReadManifest).nextOption()
      .getOrElse(throw new IllegalStateException(
        s"store $dir has no complete manifest (not initialized, or every " +
          "manifest is torn)"))
    (m, next)
  }

  // ── Generations ──────────────────────────────────────────────────────────

  /** Generation names carry a random nonce so CONCURRENT writers racing
    * the same commit never collide on the data write either — without it
    * both racers computed the same dir name and corrupted each other's
    * parquet output before the manifest conflict could fire (found by the
    * race spec). A crashed/lost racer's uniquely-named dir is unreferenced
    * garbage the next GC sweeps.
    */
  private def genName(v: Long, tag: String): String =
    s"gen-$v-$tag-" + java.util.UUID.randomUUID().toString

  /** Nonce-only generation name for rebasable commits (merge/compact):
    * their manifest slot is chosen INSIDE the commit loop and can move
    * under rebase, so a version embedded in the dir name — taken from a
    * pre-loop listing — could disagree with the slot that finally wins,
    * which is harmless but misleading when debugging on-disk state
    * (ADVICE r11). The manifest entry is the sole authority; the name
    * carries only the tag and the anti-collision nonce. The nonce is the
    * FULL 122-bit UUID: generation dirs are written with
    * mode("overwrite"), so a nonce collision with a live referenced
    * generation would silently clobber committed data while the manifest
    * still references it — at 32 bits (the pre-r13 `take(8)`) a busy
    * store crosses birthday odds around ~2^16 commits; at 122 bits the
    * failure mode is gone for any physically possible commit count
    * (ADVICE r12).
    */
  private def genName(tag: String): String =
    s"gen-$tag-" + java.util.UUID.randomUUID().toString

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn(bucketCol, pmod(hash(pkCols.map(col): _*), lit(numBuckets)))

  private def rmTree(f: java.io.File): Unit = graft.util.Fs.rmTree(f)

  /** Drop generation dirs referenced by NO retained manifest, and retired
    * manifests beyond `keepVersions`. Runs strictly after the new manifest
    * is readable; crash mid-GC leaves unreferenced garbage that the next
    * GC retries. Unreferenced dirs are also what a crashed WRITE leaves —
    * same sweep covers both.
    */
  private def gc(): Unit = {
    // one decode pass; retention counts COMPLETE manifests only — torn
    // files burn version numbers (putManifest) and may pile up above the
    // newest complete one after repeated crashed puts, and counting them
    // toward the newest-K window would push the SERVING manifest out of
    // retention and free its generations (review r10)
    val decoded = manifestFiles().map(f => f -> tryReadManifest(f))
    val complete = decoded.collect { case (f, Some(m)) => (f, m) }
    val retained = complete.take(keepVersions)
    val referenced: Set[String] = retained
      .flatMap { case (_, m) => m.base.values ++ m.deltas.map(_._2) }.toSet
    val now = System.currentTimeMillis()
    // newest mtime anywhere in the tree: an in-flight Spark write keeps
    // touching task files even while the root dir's own mtime goes stale
    def newestMtime(f: java.io.File): Long =
      math.max(f.lastModified(),
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .map(newestMtime).maxOption.getOrElse(0L))
    Option(root.listFiles((f: java.io.File) =>
      f.isDirectory && f.getName.startsWith("gen-")))
      .getOrElse(Array.empty[java.io.File])
      .filterNot(d => referenced.contains(d.getName))
      // age gate: a YOUNG unreferenced dir may be a concurrent writer's
      // in-flight commit (see orphanGraceMs) — only stale orphans sweep
      .filter(d => now - newestMtime(d) >= orphanGraceMs)
      .foreach(rmTree)
    // complete manifests past retention; plus TORN debris (burned version
    // slots) once it is past the grace too (a young torn file may be a
    // concurrent writer's put still in flight)
    complete.drop(keepVersions).foreach(_._1.delete())
    decoded.collect { case (f, None) => f }
      .filter(f => now - f.lastModified() >= orphanGraceMs)
      .foreach(_.delete())
    // staging debris: a crash between a putManifest's staged write and its
    // link (or between link and unlink) leaves a .staging file — invisible
    // to the manifest listing, swept once aged like other orphans
    Option(root.listFiles((_: java.io.File, n: String) =>
      n.startsWith(".staging-")))
      .getOrElse(Array.empty[java.io.File])
      .filter(f => now - f.lastModified() >= orphanGraceMs)
      .foreach(_.delete())
  }

  private def schemaOf(m: Manifest): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  // ── Public surface ───────────────────────────────────────────────────────

  def exists: Boolean = manifestFiles().nonEmpty

  def currentVersion: Long = currentManifest().version

  /** Feed position = manifest version (see [[KeyedUpsertStore]]). */
  def feedVersion: Long = currentVersion

  def deltaCount: Int = currentManifest().deltas.size

  /** Bootstrap from an initial load: one generation for all buckets. A
    * RE-initialize over a live store publishes as the NEXT version — one
    * atomic cutover, old history expiring through normal retention — never
    * a lower version number that the highest-complete-wins reader would
    * silently ignore (the failure mode a wholesale overwrite invites).
    */
  def initialize(initialLoad: DataFrame): Unit = {
    root.mkdirs()
    val v = nextVersion()
    val data = withBucket(initialLoad.drop(Cdc.ChangeType, Cdc.TransactionId))
      .repartition(col(bucketCol))
    val gen = genName(v, "init")
    data.write.partitionBy(bucketCol).mode("overwrite")
      .parquet(new java.io.File(root, gen).getPath)
    // data durable BEFORE the commit record references it (ADVICE r10)
    graft.util.Fs.fsyncTree(new java.io.File(root, gen))
    val buckets = bucketDirsOf(gen)
    putManifest(Manifest(v, data.schema.json,
      buckets.map(_ -> gen).toMap, Seq.empty))
    gc()
  }

  /** Bounded optimistic-commit loop (the Iceberg retry model, VERDICT r10
    * #1): `attempt(current)` builds and PUTs the next manifest on top of
    * `current`; on [[CommitConflictException]] the loop re-reads the new
    * current manifest, lets the caller REVALIDATE + REBASE via
    * `validate` (return false to abort — e.g. a compaction whose
    * folded inputs were themselves compacted away), and retries on the
    * next free slot. The retry bound turns a pathological livelock (N
    * writers in perfect lockstep) into a loud error instead of an
    * unbounded spin; `onAbort` reclaims the caller's staged generation.
    */
  /** Test seam: runs between a commit attempt's (manifest, slot) snapshot
    * and its conditional PUT — the window a concurrent commit must land in
    * to force the retry/rebase path. No-op in production; the concurrency
    * spec overrides it to inject a competing writer DETERMINISTICALLY
    * (thread-timing races exercise the same path only probabilistically).
    */
  protected def beforeCommitAttempt(): Unit = {}

  /** Test seam: runs before the commit loop's FIRST (manifest, slot)
    * snapshot — the fold/write window a competitor must land in to
    * exercise first-attempt validation (no slot conflict ever fires
    * there; only `validate` can catch it).
    */
  protected def beforeCommitLoop(): Unit = {}

  private def commitWithRetry(maxRetries: Int)(
      attempt: (Manifest, Long) => Unit)(
      validate: Manifest => Boolean)(onAbort: => Unit): Unit = {
    beforeCommitLoop()
    var (m, slot) = currentState()
    var retries = 0
    while (true) {
      beforeCommitAttempt()
      // validate EVERY state — including the first: a compaction's fold
      // inputs were snapshotted BEFORE its (long) fold/write, and a
      // competitor that committed inside that window is already visible
      // in the first currentState(), where no slot conflict would ever
      // fire (r11 adversarial review: the unvalidated first attempt
      // silently published a stale base over a concurrent compact)
      if (!validate(m)) {
        onAbort
        throw new CommitConflictException(
          s"store $dir: commit inputs were invalidated by a concurrent " +
            "commit (fold inputs replaced) — re-read and re-run")
      }
      try { attempt(m, slot); return }
      catch {
        case e: CommitConflictException =>
          // absorbed-and-rebased conflicts are counted (r18, VERDICT r17
          // #2) so the bench can report contention per entry
          UpsertStore.addCount("commit_conflicts")
          retries += 1
          if (retries > maxRetries) { onAbort; throw e }
          // brief jittered backoff so lockstep racers desynchronize
          Thread.sleep(1L + scala.util.Random.nextInt(8))
          val (nm, ns) = currentState()
          m = nm; slot = ns
      }
    }
  }

  private def bucketDirsOf(gen: String): Seq[Int] =
    Option(new java.io.File(root, gen).listFiles((f: java.io.File) =>
      f.getName.startsWith(s"$bucketCol=")))
      .getOrElse(Array.empty[java.io.File])
      .map(_.getName.stripPrefix(s"$bucketCol=").toInt).toSeq

  /** MOR merge: the folded batch becomes one immutable delta generation;
    * the commit is the manifest put. Crash before the put → the dir is
    * unreferenced, the batch invisible, the (un-advanced) upstream ledger
    * replays it — idempotent under LWW exactly like [[UpsertStore]].
    */
  def merge(folded: DataFrame): Unit = {
    val data = withBucket(folded.drop(Cdc.TransactionId))
      .repartition(col(bucketCol))
    val gen = genName("delta")
    val tWrite = System.nanoTime()
    data.write.partitionBy(bucketCol).mode("overwrite")
      .parquet(new java.io.File(root, gen).getPath)
    // data durable BEFORE the commit record references it (ADVICE r10)
    graft.util.Fs.fsyncTree(new java.io.File(root, gen))
    UpsertStore.addPhase("merge_write", (System.nanoTime() - tWrite) / 1e9)
    if (bucketDirsOf(gen).isEmpty) { rmTree(new java.io.File(root, gen)); return }
    val tSwap = System.nanoTime()
    // A merge is ALWAYS rebasable (VERDICT r10 #1): the generation dir is
    // immutable and carries no seq — the manifest entry assigns it — so a
    // losing writer simply recomputes (seq, version, schema) against the
    // winner's manifest and re-points the SAME dir. Deltas append; nothing
    // to revalidate.
    commitWithRetry(maxRetries = 100) { (m, slot) =>
      // seq clears both the live deltas AND the manifest-recorded
      // compaction floor — so an all-deletes compaction (no surviving
      // compact gen) cannot make a later merge reuse an already-folded
      // seq (review r10)
      val seq = (m.deltas.map(_._1) :+ m.floorSeq).max + 1
      // additive schema evolution, same contract as UpsertStore.mergeDelta
      val existing = schemaOf(m)
      val newFields = data.schema.fields.filter(f =>
        f.name != Cdc.ChangeType && !existing.fieldNames.contains(f.name))
      val schemaJson =
        if (newFields.isEmpty) m.schemaJson
        else org.apache.spark.sql.types.StructType(
          existing.fields.filterNot(_.name == bucketCol) ++ newFields :+
            existing(existing.fieldIndex(bucketCol))).json
      putManifest(Manifest(slot, schemaJson, m.base,
        m.deltas :+ (seq -> gen), floorSeq = m.floorSeq))
    }(validate = _ => true)(onAbort = rmTree(new java.io.File(root, gen)))
    gc()
    UpsertStore.addPhase("swap", (System.nanoTime() - tSwap) / 1e9)
  }

  /** Base ∪ deltas folded LWW by (pk, max seq) — the same fold as
    * [[UpsertStore.foldedView]], resolved through the manifest. Each
    * generation dir is ONE partitioned parquet read with a bucket
    * partition filter (directory pruning) — never a per-bucket union,
    * whose plan (one scan node per bucket dir) made the compaction fold
    * ~8× slower at 32 buckets.
    */
  private def folded(m: Manifest, bucket: Option[Int]): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = schemaOf(m)
    val withEnvelope = StructType(
      schema.fields :+ StructField(Cdc.ChangeType, StringType))
    def emptyDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    /** One partitioned read of a whole generation dir, pruned to
      * `buckets` by a partition filter.
      */
    def readGen(gen: String, buckets: Set[Int], envelope: Boolean): DataFrame = {
      val df = spark.read.schema(if (envelope) withEnvelope else schema)
        .parquet(new java.io.File(root, gen).getPath)
      if (buckets == null) df
      else df.where(col(bucketCol).isin(buckets.toSeq: _*))
    }
    val deltas = m.deltas.filter { case (_, g) =>
      bucket.forall(b => new java.io.File(root, s"$g/$bucketCol=$b").exists())
    }
    val touched: Set[Int] = deltas.flatMap { case (_, g) => bucketDirsOf(g) }
      .toSet.filter(t => bucket.forall(_ == t))
    // base read: group buckets by serving generation, one read per gen
    val wantBuckets = bucket.map(Seq(_)).getOrElse(m.base.keys.toSeq.sorted)
      .filter(m.base.contains)
    val byGen = wantBuckets.groupBy(m.base).toSeq.sortBy(_._1)
    def baseFor(buckets: Set[Int]): Option[DataFrame] =
      byGen.flatMap { case (g, bs) =>
        val keep = bs.filter(buckets).toSet
        if (keep.isEmpty) None else Some(readGen(g, keep, envelope = false))
      }.reduceOption(_.unionByName(_))
    val untouchedBase = baseFor(wantBuckets.toSet -- touched)
    if (deltas.isEmpty || touched.isEmpty)
      return untouchedBase.getOrElse(emptyDf)
    val touchedBase = baseFor(wantBuckets.toSet.intersect(touched))
      .getOrElse(emptyDf)
      .withColumn(Cdc.ChangeType, lit(Cdc.Upsert))
      .withColumn(seqCol, lit(0L))
    val all = deltas.foldLeft(touchedBase) { case (acc, (seq, g)) =>
      acc.unionByName(
        readGen(g, bucket.map(Set(_)).orNull, envelope = true)
          .withColumn(seqCol, lit(seq)),
        allowMissingColumns = true)
    }
    val payload = struct(withEnvelope.fieldNames.map(col).toIndexedSeq: _*)
    val foldedTouched = all.groupBy(pkCols.map(col): _*)
      .agg(max_by(payload, col(seqCol)).alias("_r"))
      .select(col("_r.*"))
      .where(col(Cdc.ChangeType) === Cdc.Upsert)
      .drop(Cdc.ChangeType)
    untouchedBase match {
      case Some(u) => foldedTouched.unionByName(u)
      case None => foldedTouched
    }
  }

  def snapshot(): DataFrame =
    folded(currentManifest(), bucket = None).drop(bucketCol)

  def compactIfNeeded(maxDeltas: Int = 16): Boolean = {
    require(maxDeltas > 0, s"maxDeltas must be positive, got $maxDeltas")
    val due = deltaCount >= maxDeltas
    if (due) compact()
    due
  }

  /** Delta bytes vs base bytes from the manifest's own references — a
    * directory listing, no data read (same policy shape as
    * [[UpsertStore.compactIfDeltaRatio]]).
    */
  def compactIfDeltaRatio(maxRatio: Double = 0.2): Boolean = {
    require(maxRatio > 0, s"maxRatio must be positive, got $maxRatio")
    val m = currentManifest()
    def bytesOf(gen: String, bucket: Option[Int]): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      bucket match {
        case Some(b) => walk(new java.io.File(root, s"$gen/$bucketCol=$b"))
        case None => walk(new java.io.File(root, gen))
      }
    }
    // base bytes count each bucket under its SERVING gen only (a compact
    // gen dir may hold buckets that a later compact superseded)
    val base = m.base.toSeq.map { case (b, g) => bytesOf(g, Some(b)) }.sum
    val delta = m.deltas.map { case (_, g) => bytesOf(g, None) }.sum
    val due = delta > 0 && (base == 0L || delta.toDouble / base >= maxRatio)
    if (due) compact()
    due
  }

  /** Time travel across RETAINED manifests — versions are the history. */
  def snapshotAt(version: Long): DataFrame =
    folded(manifestAt(version), bucket = None).drop(bucketCol)

  /** CHANGE DATA FEED between two retained versions: envelope rows
    * (`_change_type` + payload) whose LWW apply takes `snapshotAt(from)`
    * to `snapshotAt(to)` — the same contract as [[UpsertStore
    * .changesBetween]], resolved through the version history instead of
    * on-disk delta dirs: every retained manifest in `(from, to]` names the
    * delta generation its commit added, and GC keeps those generations
    * alive exactly as long as a referencing manifest is retained — so the
    * feed window IS the manifest retention window (`keepVersions`), and a
    * range beyond it refuses loudly.
    */
  def changesBetween(fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    require(fromVersion <= toVersion,
      s"empty range: $fromVersion > $toVersion")
    // ONE listing pass, each manifest decoded once (review r10 — the
    // per-version manifestAt loop re-read and re-digested every file
    // twice per version in the range). Version-number GAPS are expected:
    // torn puts burn their slot (see putManifest), so the range resolves
    // over the retained COMPLETE manifests whose version falls inside it.
    val retained = manifestFiles().flatMap(tryReadManifest)
    def at(v: Long): Manifest = retained.find(_.version == v)
      .getOrElse(throw new IllegalStateException(
        s"store $dir: version $v is not retained (keepVersions=" +
          s"$keepVersions) or never committed"))
    val mTo = at(toVersion)
    val mFrom = at(fromVersion)
    val inRange = retained
      .filter(mf => mf.version > fromVersion && mf.version <= toVersion)
    val schema = schemaOf(mTo)
    val withEnvelope = StructType(
      schema.fields.filterNot(_.name == bucketCol) :+
        StructField(Cdc.ChangeType, StringType))
    // the deltas ADDED in the range: union of retained manifests' delta
    // lists in (from, to], minus what `from` already had. Seqs are unique
    // per delta, so distinct-by-seq reconstructs the exact add order even
    // across compactions inside the range (a compact drops deltas from
    // LATER manifests but the earlier retained manifests still name them,
    // and their gen dirs survive GC by those references).
    // a re-initialization inside the range starts a NEW history (its init
    // generation resets the delta sequence): a per-key change feed across
    // it is meaningless — refuse rather than mix sequences from two
    // histories (seq collisions would silently drop post-init deltas)
    val initGens = inRange.flatMap(_.base.values).toSet
      .filter(_.contains("-init-"))
      .diff(mFrom.base.values.toSet)
    if (initGens.nonEmpty) throw new IllegalStateException(
      s"store $dir: range ($fromVersion, $toVersion] spans a " +
        s"re-initialization (${initGens.mkString(", ")}) — the feed " +
        "cannot relate keys across histories; read the full snapshot")
    val atFrom = mFrom.deltas.map(_._1).toSet
    val added = inRange.flatMap(_.deltas)
      .distinct
      .filterNot { case (s, _) => atFrom.contains(s) }
      .sortBy(_._1)
    if (added.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withEnvelope)
    val onDisk = StructType(
      schema.fields :+ StructField(Cdc.ChangeType, StringType))
    val all = added.map { case (sq, g) =>
      spark.read.schema(onDisk)
        .parquet(new java.io.File(root, g).getPath)
        .withColumn(seqCol, lit(sq))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val payload = struct(onDisk.fieldNames.map(col).toIndexedSeq: _*)
    all.groupBy(pkCols.map(col): _*)
      .agg(max_by(payload, col(seqCol)).alias("_r"))
      .select(col("_r.*"))
      .drop(bucketCol)
  }

  /** Point lookup: the key's bucket prunes both the base generation read
    * and the delta list — same shape as [[UpsertStore.lookup]].
    */
  def lookup(key: Any*): DataFrame = {
    require(key.length == pkCols.length,
      s"lookup needs ${pkCols.length} key value(s), got ${key.length}")
    val m = currentManifest()
    val schema = schemaOf(m)
    val typedKey = pkCols.zip(key).map { case (c, v) =>
      lit(v).cast(schema(schema.fieldIndex(c)).dataType)
    }
    // job-free driver-side bucket probe (r20) — see UpsertStore.bucketOf
    val b = UpsertStore.bucketOf(spark, typedKey, numBuckets)
    val pred = pkCols.zip(typedKey)
      .map { case (c, v) => col(c) === v }.reduce(_ && _)
    folded(m, bucket = Some(b)).where(pred).drop(bucketCol)
  }

  /** Bucket-selective compaction, manifest-style: fold ONLY the buckets
    * the deltas touch into fresh generation dirs; untouched buckets keep
    * their existing immutable dirs — the new manifest simply references
    * them again (zero IO for the untouched part, not even a listing of
    * their files). Crash before the manifest put → old manifest serves
    * base+deltas unchanged.
    */
  def compact(): Unit = {
    val tc = System.nanoTime()
    val m0 = currentManifest()
    if (m0.deltas.isEmpty) return
    val touched: Set[Int] =
      m0.deltas.flatMap { case (_, g) => bucketDirsOf(g) }.toSet
    val maxSeq = m0.deltas.map(_._1).max
    val foldedSeqs = m0.deltas.map(_._1).toSet
    val gen = genName(s"compact$maxSeq")
    // the touched-only fold: reuse `folded` restricted per-bucket is
    // wasteful (one plan per bucket); restrict by dropping untouched from
    // the base map instead
    val touchedOnly = m0.copy(base = m0.base.filter(kv => touched(kv._1)))
    val tw = System.nanoTime()
    folded(touchedOnly, bucket = None)
      .repartition(col(bucketCol))
      .write.partitionBy(bucketCol).mode("overwrite")
      .parquet(new java.io.File(root, gen).getPath)
    // data durable BEFORE the commit record references it (ADVICE r10)
    graft.util.Fs.fsyncTree(new java.io.File(root, gen))
    UpsertStore.addPhase("compact_write", (System.nanoTime() - tw) / 1e9)
    val survivors = bucketDirsOf(gen).toSet
    val ts = System.nanoTime()
    // A compaction REBASES like Iceberg's rewrite_data_files (VERDICT r10
    // #1): on losing the slot race it revalidates that its folded inputs
    // are still exactly what the current manifest serves — concurrent
    // MERGES only append deltas, so the rebase keeps the winner's new
    // deltas live on top of our fresh base; a concurrent COMPACT or
    // re-initialize invalidates the fold (our inputs were replaced) and
    // aborts loudly with the staged generation reclaimed.
    commitWithRetry(maxRetries = 100) { (m, slot) =>
      val newBase = (m.base -- touched.diff(survivors)) ++
        survivors.map(_ -> gen)
      val rest = m.deltas.filterNot { case (s, _) => foldedSeqs(s) }
      // the folded maxSeq becomes the recorded compaction floor — survives
      // even when every touched bucket was emptied (review r10)
      putManifest(Manifest(slot, m.schemaJson, newBase, rest,
        floorSeq = math.max(m.floorSeq, maxSeq)))
    } { next =>
      next.base == m0.base && m0.deltas.forall(next.deltas.contains)
    }(onAbort = rmTree(new java.io.File(root, gen)))
    gc()
    UpsertStore.addPhase("compact_swap", (System.nanoTime() - ts) / 1e9)
    UpsertStore.addPhase("compact", (System.nanoTime() - tc) / 1e9)
  }
}
