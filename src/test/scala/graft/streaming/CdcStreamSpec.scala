package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Cdc

/** End-to-end streaming CDC: MemoryStream change feed → commit-order
  * watermark → delta fold → bucket-merge store → ledger advance; plus
  * replay idempotence and stuck-transaction semantics (ST1-ST7).
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString

  // change-feed rows: (id, payload, txid)
  private def feed(rows: (Long, String, Long)*) =
    rows.toDF("id", "payload", Cdc.TransactionId)

  private def newStore(dir: String): UpsertStore = {
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4)
    store.initialize(Cdc.initialLoad(
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "payload")))
    store
  }

  test("upsert store: initialize + snapshot round-trip") {
    val store = newStore(tmp("store"))
    assert(store.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "two"), (3L, "three")))
  }

  test("writer lease: second live writer fails fast; stale lease steals; release hands over") {
    val dir = tmp("store")
    val s1 = newStore(dir) // initialize claims the lease
    val up = Seq((Cdc.Upsert, 10L, 9L, "nine"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    s1.merge(up) // heartbeat
    // a second writer over the same dir must fail FAST, for merge and
    // compact both (two interleaved _staging overwrites corrupt a swap)
    val s2 = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4)
    val err = intercept[IllegalStateException] { s2.merge(up) }
    assert(err.getMessage.contains("single-writer"), err.getMessage)
    intercept[IllegalStateException] { s2.compact() }
    // a READER through another instance is fine — and must leave the live
    // writer's state alone (no recovery-driven staging deletes, ADVICE r7)
    assert(s2.snapshot().as[(Long, String)].collect().toMap.get(9L)
      .contains("nine"))
    // clean handover: release, then the second writer proceeds
    s1.releaseLease()
    s2.merge(Seq((Cdc.Upsert, 11L, 9L, "NINE"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(s2.snapshot().as[(Long, String)].collect().toMap.get(9L)
      .contains("NINE"))
    // crashed-writer takeover: a ttl-0 store treats any foreign lease as
    // expired and steals it
    val s3 = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4,
      leaseTtlMs = 0L)
    s3.merge(Seq((Cdc.Upsert, 12L, 9L, "n9"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(s3.snapshot().as[(Long, String)].collect().toMap.get(9L)
      .contains("n9"))
    // restart-with-stable-identity: same writerId resumes its own lease
    // without waiting out the TTL
    val jobA = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4,
      writerId = Some("job-A"))
    intercept[IllegalStateException] { jobA.merge(up) } // s3's lease is live
    s3.releaseLease()
    jobA.merge(up)
    val jobA2 = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4,
      writerId = Some("job-A")) // "restarted" incarnation
    jobA2.merge(Seq((Cdc.Upsert, 13L, 9L, "again"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(jobA2.snapshot().as[(Long, String)].collect().toMap.get(9L)
      .contains("again"))
  }

  // ── Merge-on-read mode ──────────────────────────────────────────────────

  private def morStore(dir: String): UpsertStore = {
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4,
      mergeOnRead = true)
    store.initialize(Cdc.initialLoad(
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "payload")))
    store
  }

  test("MOR: same snapshots as COW across a batch sequence; O(batch) appends") {
    val cow = newStore(tmp("cow"))
    val morDir = tmp("mor")
    val mor = morStore(morDir)
    val batches = Seq(
      Seq((Cdc.Upsert, 10L, 2L, "TWO"), (Cdc.Upsert, 11L, 9L, "nine"),
        (Cdc.Delete, 12L, 3L, null.asInstanceOf[String])),
      Seq((Cdc.Upsert, 13L, 9L, "NINE"), (Cdc.Delete, 14L, 1L, null.asInstanceOf[String])),
      Seq((Cdc.Upsert, 15L, 3L, "back"), (Cdc.Upsert, 16L, 2L, "two2")))
    for (b <- batches) {
      val df = b.toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
      cow.merge(df); mor.merge(df)
      assert(mor.snapshot().as[(Long, String)].collect().toSet ==
        cow.snapshot().as[(Long, String)].collect().toSet)
    }
    assert(mor.snapshot().as[(Long, String)].collect().toSet ==
      Set((2L, "two2"), (9L, "NINE"), (3L, "back")))
    // the base was never rewritten: three published delta dirs exist
    val root = new java.io.File(morDir)
    assert(root.listFiles((_: java.io.File, n: String) =>
      n.matches("_delta_\\d+")).length == 3)
  }

  test("reader under a crashed foreign mid-swap sees the complete store (read overlay)") {
    // writer crashes inside swapStaged AFTER the commit marker and the
    // retire rename but BEFORE promoting the staged copy; its lease stays
    // fresh for the TTL, so a reader skips recovery — without the overlay
    // the mid-swap bucket would be invisible for up to leaseTtlMs
    // (review r8)
    val dir = tmp("overlay")
    val s1 = newStore(dir) // holds the lease
    val before = s1.snapshot().as[(Long, String)].collect().toSet
    val root = new java.io.File(dir)
    val bucket = root.listFiles((f: java.io.File) =>
      f.getName.startsWith("_bucket=")).head
    val b = bucket.getName.stripPrefix("_bucket=")
    def cp(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs(); src.listFiles().foreach(f => cp(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    cp(bucket, new java.io.File(dir, s"_staging/_bucket=$b"))
    new java.io.File(dir, "_swap_started").createNewFile()
    java.nio.file.Files.move(bucket.toPath,
      new java.io.File(dir, s"_retired_$b").toPath)
    // a DIFFERENT instance reads within the TTL: recovery is skipped, the
    // overlay must still serve the mid-swap bucket
    val reader = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4)
    assert(reader.snapshot().as[(Long, String)].collect().toSet == before)
    // the owner's next operation heals the debris for real
    assert(s1.snapshot().as[(Long, String)].collect().toSet == before)
    assert(!new java.io.File(dir, "_swap_started").exists())
  }

  test("MOR merge writes O(batch) bytes; COW rewrites touched-bucket data (measured)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytes.addAndGet(e.taskMetrics.outputMetrics.bytesWritten)
    }
    def written(body: => Unit): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        bytes.set(0)
        body
        var last = -1L; var spins = 0
        while (bytes.get() != last && spins < 50) {
          last = bytes.get(); Thread.sleep(100); spins += 1
        }
        bytes.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // a 20k-row base across 2 buckets; the batch touches 10 keys — every
    // bucket is dirty, so COW must rewrite ~the whole base while MOR
    // appends ~the batch
    val base = spark.range(20000L)
      .select($"id", concat(lit("payload_"), $"id").as("payload"))
    val batch = Seq.tabulate(10)(i =>
        (Cdc.Upsert, 100L + i, i * 1000L, s"updated_$i"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    def run(mor: Boolean): Long = {
      val store = new UpsertStore(spark, tmp("amp"), Seq("id"),
        numBuckets = 2, mergeOnRead = mor)
      store.initialize(Cdc.initialLoad(base))
      written { store.merge(batch) }
    }
    val cowBytes = run(false)
    val morBytes = run(true)
    // the design claim, measured: COW write amplification is the touched
    // buckets' FULL data (~20k rows here), MOR's is the 10-row batch
    assert(morBytes * 10 < cowBytes,
      s"MOR wrote $morBytes vs COW $cowBytes — expected ≥10× separation")
  }

  test("MOR delta is bucket-aligned: one file per touched bucket") {
    val dir = tmp("morfiles")
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 8,
      mergeOnRead = true)
    store.initialize(Cdc.initialLoad(
      (1L to 64L).map(i => (i, s"v$i")).toDF("id", "payload")))
    // a wide batch (touches many buckets) written from many partitions:
    // without the aligning exchange this would write tasks × buckets files
    store.merge(spark.range(1, 65)
      .select(lit(Cdc.Upsert).alias(Cdc.ChangeType),
        (col("id") + 100L).alias(Cdc.TransactionId), col("id"),
        concat(lit("u"), col("id")).alias("payload"))
      .repartition(16))
    val delta = new java.io.File(dir).listFiles((_: java.io.File, n: String) =>
      n.matches("_delta_\\d+")).head
    delta.listFiles((f: java.io.File) => f.getName.startsWith("_bucket="))
      .foreach { b =>
        val n = b.listFiles((f: java.io.File) =>
          f.getName.endsWith(".parquet")).length
        assert(n === 1, s"delta bucket ${b.getName} holds $n files, want 1")
      }
  }

  test("mode mismatch is safe: COW-flagged readers fold deltas, COW merges refuse") {
    val dir = tmp("mix")
    val mor = morStore(dir)
    mor.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    // a COW-flagged instance over the same dir: snapshot must NOT silently
    // serve the stale base — published deltas are data regardless of the
    // instance's write mode
    mor.releaseLease()
    val cowView = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4)
    assert(cowView.snapshot().as[(Long, String)].collect().toMap.get(2L)
      .contains("TWO"))
    // a COW merge over un-folded deltas would corrupt LWW precedence:
    // refuse loudly
    val up = Seq((Cdc.Upsert, 11L, 1L, "ONE"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    val err = intercept[IllegalStateException] { cowView.merge(up) }
    assert(err.getMessage.contains("un-compacted delta"), err.getMessage)
    // compact folds the debt away (dispatches on disk state, not the
    // flag); then the COW merge proceeds
    assert(cowView.deltaCount == 1)
    cowView.compact()
    assert(cowView.deltaCount == 0)
    cowView.merge(up)
    assert(cowView.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "ONE"), (2L, "TWO"), (3L, "three")))
    // compactIfNeeded: fires only at the threshold
    mor.releaseLease(); cowView.releaseLease()
    val mor2 = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4,
      mergeOnRead = true)
    mor2.merge(up)
    assert(!mor2.compactIfNeeded(maxDeltas = 2) && mor2.deltaCount == 1)
    mor2.merge(up)
    assert(mor2.compactIfNeeded(maxDeltas = 2) && mor2.deltaCount == 0)
  }

  test("MOR: replay of the same batch is idempotent (a later equal delta wins harmlessly)") {
    val mor = morStore(tmp("morr"))
    val b = Seq((Cdc.Upsert, 10L, 2L, "TWO"),
      (Cdc.Delete, 11L, 1L, null.asInstanceOf[String]))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    mor.merge(b)
    val first = mor.snapshot().as[(Long, String)].collect().toSet
    mor.merge(b) // replay: a second delta with identical content
    assert(mor.snapshot().as[(Long, String)].collect().toSet == first)
    assert(first == Set((2L, "TWO"), (3L, "three")))
  }

  test("MOR: compaction folds deltas into the base; stale deltas reapply harmlessly") {
    val dir = tmp("morc")
    val mor = morStore(dir)
    mor.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"),
      (Cdc.Delete, 11L, 3L, null.asInstanceOf[String]))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    val before = mor.snapshot().as[(Long, String)].collect().toSet
    val root = new java.io.File(dir)
    // keep a copy of the delta aside to simulate a compaction that crashed
    // before removing it
    val delta = root.listFiles((_: java.io.File, n: String) =>
      n.matches("_delta_\\d+")).head
    val aside = new java.io.File(dir + "_aside") // outside the store dir
    def cp(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs(); src.listFiles().foreach(f => cp(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    cp(delta, aside)
    mor.compact()
    assert(root.listFiles((_: java.io.File, n: String) =>
      n.matches("_delta_\\d+")).isEmpty)
    assert(mor.snapshot().as[(Long, String)].collect().toSet == before)
    // "crashed compaction": the already-folded delta reappears — the fold
    // must converge to the same state (LWW of equal values, delete of an
    // absent key)
    cp(aside, new java.io.File(dir, delta.getName))
    assert(mor.snapshot().as[(Long, String)].collect().toSet == before)
    // and the NEXT merge must outrank the stale delta (seq never reset)
    mor.merge(Seq((Cdc.Upsert, 12L, 2L, "TWO2"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(mor.snapshot().as[(Long, String)].collect().toMap.get(2L)
      .contains("TWO2"))
  }

  test("compaction is bucket-selective: untouched base files byte-identical (VERDICT r9 #1)") {
    import java.security.MessageDigest
    val dir = tmp("morsel")
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 8,
      mergeOnRead = true)
    // enough keys that every bucket holds data
    store.initialize(Cdc.initialLoad(
      (1L to 64L).map(i => (i, s"v$i")).toDF("id", "payload")))
    // two batches touching a handful of keys (few buckets)
    store.merge(Seq((Cdc.Upsert, 10L, 5L, "V5"), (Cdc.Delete, 11L, 9L,
      null.asInstanceOf[String]))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    store.merge(Seq((Cdc.Upsert, 12L, 5L, "V5b"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    val root = new java.io.File(dir)
    val touched = root.listFiles((_: java.io.File, n: String) =>
      n.matches("_delta_\\d+")).flatMap(_.listFiles(
        (f: java.io.File) => f.getName.startsWith("_bucket=")))
      .map(_.getName.stripPrefix("_bucket=").toInt).toSet
    assert(touched.nonEmpty && touched.size < 8,
      s"test setup: deltas must touch a strict subset of buckets ($touched)")
    def md5(f: java.io.File): String = MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString
    def baseFiles(bucket: Int): Map[String, String] =
      Option(new java.io.File(root, s"_bucket=$bucket")
        .listFiles((f: java.io.File) => f.isFile &&
          !f.getName.startsWith("_") && !f.getName.startsWith(".")))
        .getOrElse(Array.empty).map(f => f.getName -> md5(f)).toMap
    val untouchedBefore = (0 until 8).filterNot(touched)
      .map(b => b -> baseFiles(b)).toMap
    val expect = store.snapshot().as[(Long, String)].collect().toSet
    store.compact()
    // 1) untouched buckets: same file names, same bytes — never rewritten
    untouchedBefore.foreach { case (b, files) =>
      assert(baseFiles(b) === files,
        s"untouched bucket $b was rewritten by a selective compact")
    }
    // 2) deltas folded away, snapshot identical
    assert(root.listFiles((_: java.io.File, n: String) =>
      n.matches("_delta_\\d+")).isEmpty)
    assert(store.snapshot().as[(Long, String)].collect().toSet === expect)
    assert(expect.contains((5L, "V5b")) && !expect.exists(_._1 == 9L))
    // 3) time-travel horizon advanced with the fold (store-wide, as before)
    assert(store.earliestSeq === 2L)
    intercept[IllegalStateException](store.snapshotAsOf(1L).collect())
    // 4) a clusterBy pass is the explicit FULL-rewrite flavor
    store.merge(Seq((Cdc.Upsert, 13L, 5L, "V5c"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    val anyUntouched = untouchedBefore.keys.head
    store.compact(clusterBy = Seq("id"))
    assert(baseFiles(anyUntouched) !== untouchedBefore(anyUntouched),
      "clusterBy compact must rewrite every bucket (layout pass)")
    assert(store.snapshot().as[(Long, String)].collect().toMap.get(5L)
      .contains("V5c"))
  }

  test("selective compact handles a touched bucket emptied by deletes") {
    val dir = tmp("morempty")
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 8,
      mergeOnRead = true)
    store.initialize(Cdc.initialLoad(
      (1L to 32L).map(i => (i, s"v$i")).toDF("id", "payload")))
    // find a bucket and delete EVERY key in it
    val byBucket = (1L to 32L).map { i =>
      val b = spark.range(1).select(pmod(hash(lit(i)), lit(8)).cast("int"))
        .head().getInt(0)
      i -> b
    }
    val (victimBucket, victims) = byBucket.groupBy(_._2).view
      .mapValues(_.map(_._1)).head
    store.merge(victims.map(i => (Cdc.Delete, 100L + i, i,
        null.asInstanceOf[String]))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    store.compact()
    // the emptied bucket's base dir is gone; no victim row survives
    assert(!new java.io.File(dir, s"_bucket=$victimBucket").exists())
    val left = store.snapshot().as[(Long, String)].collect().map(_._1).toSet
    assert(left === (1L to 32L).toSet -- victims)
  }

  test("processBatch drives MOR compaction from the debt policy (VERDICT r9 #5)") {
    val dir = tmp("morauto")
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4,
      mergeOnRead = true)
    store.initialize(Cdc.initialLoad(
      Seq((1L, "one"), (2L, "two")).toDF("id", "payload")))
    val ledger = new TxidLedger(tmp("morauto-led") + "/led")
    var src = Seq((1L, "one"), (2L, "two"))
    val job = new CdcStreamJob(spark, source = () => src.toDF("id", "payload"),
      store = store, ledger = ledger, keyJoin = Seq("id" -> "id"),
      autoCompactDeltas = Some(2))
    def batch(txid: Long, ids: Long*) =
      ids.map(i => (i, txid)).toDF("id", Cdc.TransactionId)
    src = Seq((1L, "ONE"), (2L, "two"))
    job.processBatch(batch(1L, 1L), 0L)
    assert(store.deltaCount === 1) // below threshold: no compact
    src = Seq((1L, "ONE"), (2L, "TWO"))
    job.processBatch(batch(2L, 2L), 1L)
    assert(store.deltaCount === 0,
      "debt hit the threshold: processBatch must have compacted")
    assert(store.snapshot().as[(Long, String)].collect().toSet ===
      Set((1L, "ONE"), (2L, "TWO")))
    // byte-ratio policy: one huge backfill delta triggers compaction even
    // at delta-count 1 (the case the count policy misses)
    val dir2 = tmp("morauto2")
    val store2 = new UpsertStore(spark, dir2, Seq("id"), numBuckets = 4,
      mergeOnRead = true)
    store2.initialize(Cdc.initialLoad(
      Seq((1L, "x")).toDF("id", "payload")))
    val ledger2 = new TxidLedger(tmp("morauto2-led") + "/led")
    val big = (1L to 500L).map(i => (i, s"p$i"))
    val job2 = new CdcStreamJob(spark,
      source = () => big.toDF("id", "payload"),
      store = store2, ledger = ledger2, keyJoin = Seq("id" -> "id"),
      autoCompactRatio = Some(0.5))
    job2.processBatch(big.map { case (i, _) => (i, 10L) }
      .toDF("id", Cdc.TransactionId), 0L)
    assert(store2.deltaCount === 0,
      "backfill delta >> base: ratio policy must have compacted")
    assert(store2.snapshot().count() === 500L)
  }

  test("MOR: torn tmp delta is ignored and swept; schema evolves additively") {
    val dir = tmp("mort")
    val mor = morStore(dir)
    // a crashed publish leaves a tmp dir: invisible to snapshot, swept by
    // the next merge
    val torn = new java.io.File(dir, "_delta_tmp_99")
    torn.mkdirs()
    java.nio.file.Files.write(new java.io.File(torn, "junk").toPath,
      "not parquet".getBytes)
    assert(mor.snapshot().count() == 3)
    // evolution: a delta carries a NEW column; missing columns null-fill
    mor.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO", "extra"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload", "note"))
    assert(!torn.exists(), "torn tmp delta not swept")
    val got = mor.snapshot().as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "one", None), (2L, "TWO", Some("extra")),
      (3L, "three", None)))
    // all-delete then compact: dead buckets drop, store stays usable
    val wipe = mor.snapshot().select($"id").as[Long].collect().map(id =>
      (Cdc.Delete, 20L, id, null.asInstanceOf[String], null.asInstanceOf[String]))
    mor.merge(wipe.toSeq.toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload", "note"))
    assert(mor.snapshot().count() == 0)
    mor.compact()
    assert(mor.snapshot().count() == 0)
    mor.merge(Seq((Cdc.Upsert, 21L, 7L, "seven", "n"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload", "note"))
    assert(mor.snapshot().as[(Long, String, Option[String])].collect().toSet ==
      Set((7L, "seven", Some("n"))))
  }

  test("time travel: snapshotAsOf serves each MOR version; compact/COW advance the horizon") {
    val store = new UpsertStore(spark, tmp("timetravel"), Seq("id"),
      numBuckets = 4, mergeOnRead = true)
    store.initialize(Cdc.initialLoad(
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "payload")))
    assert(store.currentSeq == 0L && store.earliestSeq == 0L)
    store.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"), (Cdc.Delete, 10L, 3L, "x"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    store.merge(Seq((Cdc.Upsert, 11L, 4L, "four"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(store.currentSeq == 2L && store.earliestSeq == 0L)
    def snap(seq: Long) =
      store.snapshotAsOf(seq).as[(Long, String)].collect().toSet
    assert(snap(0) == Set((1L, "one"), (2L, "two"), (3L, "three")))
    assert(snap(1) == Set((1L, "one"), (2L, "TWO")))
    assert(snap(2) == Set((1L, "one"), (2L, "TWO"), (4L, "four")))
    assert(snap(2) == store.snapshot().as[(Long, String)].collect().toSet)
    intercept[IllegalArgumentException] { store.snapshotAsOf(3) } // future
    // compaction folds deltas 1-2 into the base: versions before seq 2 are
    // gone, and asking for them fails LOUDLY instead of serving the new
    // base as if it were old
    store.compact()
    assert(store.earliestSeq == 2L)
    intercept[IllegalStateException] { store.snapshotAsOf(1) }
    assert(snap(2) == Set((1L, "one"), (2L, "TWO"), (4L, "four")))
    // history continues past the compaction
    store.merge(Seq((Cdc.Upsert, 12L, 5L, "five"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(snap(2) == Set((1L, "one"), (2L, "TWO"), (4L, "four")))
    assert(snap(store.currentSeq) ==
      Set((1L, "one"), (2L, "TWO"), (4L, "four"), (5L, "five")))
  }

  test("time travel horizon is conservative: a crash between horizon advance and swap refuses, never lies") {
    // simulate the compact() crash window: the horizon marker persisted
    // (earliestSeq = 2) but the destroying swap did NOT run — deltas 1..2
    // still exist and the base is unfolded. The safety contract: versions
    // behind the horizon are REFUSED (even though this particular crash
    // left them technically reconstructible), while snapshot()/asOf(2)
    // still serve the correct current state; the next compact() heals.
    val dir = tmp("timetravel-crash")
    val store = new UpsertStore(spark, dir, Seq("id"),
      numBuckets = 4, mergeOnRead = true)
    store.initialize(Cdc.initialLoad(
      Seq((1L, "one"), (2L, "two")).toDF("id", "payload")))
    store.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    store.merge(Seq((Cdc.Upsert, 11L, 3L, "three"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    // crash injection: persist the horizon exactly as compact() would,
    // then "die" before the staged swap
    java.nio.file.Files.write(
      new java.io.File(dir, "_graft_base_seq").toPath, "2".getBytes("UTF-8"))
    intercept[IllegalStateException] { store.snapshotAsOf(1) }
    val now = Set((1L, "one"), (2L, "TWO"), (3L, "three"))
    assert(store.snapshot().as[(Long, String)].collect().toSet == now)
    assert(store.snapshotAsOf(2).as[(Long, String)].collect().toSet == now)
    store.compact() // heals: folds the leftover deltas over the base
    assert(store.snapshot().as[(Long, String)].collect().toSet == now)
    assert(store.earliestSeq == 2L)
  }

  test("change data feed: changesBetween is the LWW replay between versions") {
    val store = new UpsertStore(spark, tmp("cdf"), Seq("id"),
      numBuckets = 4, mergeOnRead = true)
    store.initialize(Cdc.initialLoad(
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "payload")))
    store.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"), (Cdc.Delete, 10L, 3L, "x"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    store.merge(Seq((Cdc.Upsert, 11L, 4L, "four"), (Cdc.Upsert, 11L, 2L, "TWO2"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    // (1, 2]: only batch 2's net rows
    val cdf12 = store.changesBetween(1, 2)
    assert(cdf12.select("id", "payload", Cdc.ChangeType)
      .as[(Long, String, String)].collect().toSet ==
      Set((4L, "four", "A"), (2L, "TWO2", "A")))
    // (0, 2]: latest-per-key net fold across both batches
    assert(store.changesBetween(0, 2)
      .select("id", "payload", Cdc.ChangeType)
      .as[(Long, String, String)].collect().toSet ==
      Set((2L, "TWO2", "A"), (3L, "x", "D"), (4L, "four", "A")))
    // REPLAY IDENTITY: asOf(1) + changes(1,2] == asOf(2), via a real merge
    val replay = new UpsertStore(spark, tmp("cdf-replay"), Seq("id"),
      numBuckets = 4, mergeOnRead = true)
    replay.initialize(Cdc.initialLoad(store.snapshotAsOf(1)))
    replay.merge(cdf12)
    assert(replay.snapshot().as[(Long, String)].collect().toSet ==
      store.snapshotAsOf(2).as[(Long, String)].collect().toSet)
    // empty range is an empty frame with the envelope schema, not a crash
    val empty = store.changesBetween(2, 2)
    assert(empty.isEmpty && empty.columns.contains(Cdc.ChangeType))
    // refusals: future version; compacted-away history
    intercept[IllegalArgumentException] { store.changesBetween(1, 9) }
    store.compact()
    intercept[IllegalStateException] { store.changesBetween(0, store.currentSeq) }
  }

  test("store change-feed consumer: at-least-once tail with a durable cursor") {
    val store = new UpsertStore(spark, tmp("feed-src"), Seq("id"),
      numBuckets = 4, mergeOnRead = true)
    store.initialize(Cdc.initialLoad(
      Seq((1L, "one"), (2L, "two")).toDF("id", "payload")))
    val cursorPath = tmp("feed-cursor") + "/cursor"
    val feed = new StoreChangeFeed(store, cursorPath)
    // downstream replica seeded from the same initial snapshot
    val replica = new UpsertStore(spark, tmp("feed-dst"), Seq("id"),
      numBuckets = 4, mergeOnRead = true)
    replica.initialize(Cdc.initialLoad(store.snapshot()))
    def drainOnce(): Unit = {
      val (changes, to) = feed.poll()
      if (feed.cursor < to) { replica.merge(changes); feed.commit(to) }
    }
    store.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"), (Cdc.Delete, 10L, 1L, "x"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    drainOnce()
    assert(replica.snapshot().as[(Long, String)].collect().toSet ==
      Set((2L, "TWO")))
    // crash BEFORE commit: the effect applied but the cursor did not move —
    // the replayed window re-merges idempotently (at-least-once, ST4)
    store.merge(Seq((Cdc.Upsert, 11L, 3L, "three"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    val (c1, _) = feed.poll()
    replica.merge(c1) // ... crash here: no commit
    val feed2 = new StoreChangeFeed(store, cursorPath) // restarted consumer
    assert(feed2.cursor == 1L) // cursor still at the last ack
    val (c2, to2) = feed2.poll()
    replica.merge(c2) // replay converges
    feed2.commit(to2)
    assert(replica.snapshot().as[(Long, String)].collect().toSet ==
      store.snapshot().as[(Long, String)].collect().toSet)
    // a consumer behind the compaction horizon fails loudly, not silently
    store.merge(Seq((Cdc.Upsert, 12L, 4L, "four"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    store.compact()
    intercept[IllegalStateException] { feed2.poll() }
    // but a FRESH consumer attaching to the compacted store baselines at
    // the current version (review r9: a zero cursor would be permanently
    // behind-horizon) — it polls cleanly and tails new merges
    val late = new StoreChangeFeed(store, tmp("feed-cursor2") + "/cursor")
    assert(late.cursor == store.currentSeq)
    val (none, to3) = late.poll()
    assert(none.isEmpty && to3 == store.currentSeq)
    store.merge(Seq((Cdc.Upsert, 13L, 5L, "five"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    val (c3, _) = late.poll()
    assert(c3.select("id", "payload", Cdc.ChangeType)
      .as[(Long, String, String)].collect().toSet == Set((5L, "five", "A")))
  }

  test("time travel on a COW store: every rewrite moves the horizon to now") {
    val store = newStore(tmp("timetravel-cow"))
    store.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(store.currentSeq == store.earliestSeq) // no retained history
    assert(store.snapshotAsOf(store.currentSeq)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "TWO"), (3L, "three")))
    intercept[IllegalStateException] {
      store.snapshotAsOf(store.earliestSeq - 1)
    }
  }

  test("renameColumn/dropColumn: explicit rewrites; merges speak the new shape") {
    val store = newStore(tmp("schema-rewrite"))
    store.renameColumn("payload", "body")
    assert(store.snapshot().columns.toSeq == Seq("id", "body"))
    assert(store.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "two"), (3L, "three")))
    store.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "body"))
    assert(store.snapshot().as[(Long, String)].collect().toMap.get(2L)
      .contains("TWO"))
    // refusals: key columns, unknown source, existing target
    intercept[IllegalArgumentException] { store.renameColumn("id", "key") }
    intercept[IllegalArgumentException] { store.renameColumn("nope", "x") }
    intercept[IllegalArgumentException] { store.renameColumn("body", "id") }
    // the underscore namespace is the engine's (envelope/seq columns):
    // a user column named _graft_seq would be overwritten by the MOR fold
    intercept[IllegalArgumentException] {
      store.renameColumn("body", "_graft_seq")
    }
    // a MOR store folds its pending deltas before rewriting
    val mor = new UpsertStore(spark, tmp("schema-rewrite-mor"), Seq("id"),
      numBuckets = 4, mergeOnRead = true)
    mor.initialize(Cdc.initialLoad(
      Seq((1L, "one", 5)).toDF("id", "payload", "extra")))
    mor.merge(Seq((Cdc.Upsert, 10L, 2L, "two", 7))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload", "extra"))
    mor.dropColumn("extra")
    assert(mor.snapshot().columns.toSeq == Seq("id", "payload"))
    assert(mor.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "two")))
    // rewrites destroy history: horizon at now
    assert(mor.earliestSeq == mor.currentSeq)
  }

  test("schema rewrite crash protocol: schema and data commit or roll back TOGETHER") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    // branch 1 — crash BEFORE the marker: staged data + staged schema are
    // both uncommitted debris; recovery must roll both back (a promoted
    // schema over old-shape data would silently null the renamed column)
    val dir1 = tmp("rewrite-crash1")
    val s1 = newStore(dir1)
    val newSchema = StructType(Seq(StructField("id", LongType),
      StructField("body", StringType), StructField("_bucket", LongType)))
    val staging = new java.io.File(dir1, "_staging")
    new java.io.File(staging, "_bucket=0").mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(dir1, "_graft_schema_next").toPath, newSchema.json)
    assert(s1.snapshot().columns.toSeq == Seq("id", "payload")) // rolled back
    assert(!new java.io.File(dir1, "_graft_schema_next").exists())
    // branch 2 — crash AFTER the marker mid-promote: the staged set covers
    // every bucket; recovery rolls FORWARD (replacing still-live old
    // buckets) and promotes the schema — no mixed-shape store
    val dir2 = tmp("rewrite-crash2")
    val s2 = newStore(dir2)
    // build the fully-staged rewrite by hand: rename payload -> body (the
    // read already carries the _bucket partition column)
    val renamed = spark.read.parquet(dir2)
      .withColumnRenamed("payload", "body")
    renamed.write.partitionBy("_bucket").mode("overwrite")
      .parquet(new java.io.File(dir2, "_staging").getPath)
    java.nio.file.Files.writeString(
      new java.io.File(dir2, "_graft_schema_next").toPath,
      renamed.schema.json)
    java.nio.file.Files.createFile(
      new java.io.File(dir2, "_swap_started").toPath)
    val healed = s2.snapshot() // triggers recovery
    assert(healed.columns.toSeq == Seq("id", "body"))
    assert(healed.as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "two"), (3L, "three")))
    assert(!new java.io.File(dir2, "_graft_schema_next").exists())
    assert(!new java.io.File(dir2, "_swap_started").exists())
    // a READER under a foreign writer's in-flight rewrite refuses rather
    // than serving mixed shapes (it cannot run recovery; some buckets may
    // already be new-shape while the schema is still old)
    val dir3 = tmp("rewrite-inflight")
    val owner3 = newStore(dir3) // holds the lease
    java.nio.file.Files.writeString(
      new java.io.File(dir3, "_graft_schema_next").toPath, newSchema.json)
    val reader3 = new UpsertStore(spark, dir3, Seq("id"), numBuckets = 4)
    val err = intercept[IllegalStateException] { reader3.snapshot() }
    assert(err.getMessage.contains("schema rewrite"), err.getMessage)
    // the owner itself heals it (recovery rolls the uncommitted file back)
    assert(owner3.snapshot().columns.toSeq == Seq("id", "payload"))
    assert(reader3.snapshot().columns.toSeq == Seq("id", "payload"))
  }

  test("stats: COW buckets stay at one file; MOR delta debt visible and compact clears it") {
    val cow = newStore(tmp("stats-cow"))
    cow.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    val cowStats = cow.stats().as[(Int, Long, Long, Long, Long)].collect()
    assert(cowStats.nonEmpty)
    assert(cowStats.forall { case (_, bf, bb, df, db) =>
      bf == 1L && bb > 0L && df == 0L && db == 0L },
      cowStats.mkString(",")) // bucket-aligned merges: one file per bucket
    val mor = new UpsertStore(spark, tmp("stats-mor"), Seq("id"),
      numBuckets = 4, mergeOnRead = true)
    mor.initialize(Cdc.initialLoad(Seq((1L, "one")).toDF("id", "payload")))
    mor.merge(Seq((Cdc.Upsert, 10L, 1L, "ONE"), (Cdc.Upsert, 10L, 2L, "two"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    val morStats = mor.stats().as[(Int, Long, Long, Long, Long)].collect()
    assert(morStats.map(_._4).sum > 0L, "delta debt invisible") // delta files
    mor.compact()
    val after = mor.stats().as[(Int, Long, Long, Long, Long)].collect()
    assert(after.forall(r => r._4 == 0L && r._5 == 0L), after.mkString(","))
    assert(after.forall(_._2 == 1L)) // compaction leaves one file per bucket
    // byte-ratio policy: no debt → not due; fresh delta trips the ratio
    assert(!mor.compactIfDeltaRatio(0.01))
    mor.merge(Seq((Cdc.Upsert, 11L, 3L, "three"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(mor.compactIfDeltaRatio(0.01)) // small threshold: due, and ran
    assert(mor.deltaCount == 0)
  }

  test("merge applies upserts and deletes, only touched buckets rewritten") {
    val dir = tmp("store")
    val store = newStore(dir)
    val folded = Seq(
      (Cdc.Upsert, 10L, 2L, "TWO"),     // update
      (Cdc.Upsert, 11L, 9L, "nine"),    // insert
      (Cdc.Delete, 12L, 3L, null.asInstanceOf[String]) // delete
    ).toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    store.merge(folded)
    assert(store.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "TWO"), (9L, "nine")))
  }

  test("merge is idempotent (replay-safe, ST4)") {
    val dir = tmp("store")
    val store = newStore(dir)
    val folded = Seq(
      (Cdc.Upsert, 10L, 2L, "TWO"),
      (Cdc.Delete, 11L, 1L, null.asInstanceOf[String])
    ).toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    store.merge(folded)
    val first = store.snapshot().as[(Long, String)].collect().toSet
    store.merge(folded) // replay the exact same batch
    assert(store.snapshot().as[(Long, String)].collect().toSet == first)
    assert(first == Set((2L, "TWO"), (3L, "three")))
  }

  test("merge after every row was deleted still works (schema persisted)") {
    val dir = tmp("store")
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 2)
    store.initialize(Cdc.initialLoad(Seq((1L, "a"), (2L, "b")).toDF("id", "payload")))
    val wipe = Seq(
      (Cdc.Delete, 5L, 1L, null.asInstanceOf[String]),
      (Cdc.Delete, 5L, 2L, null.asInstanceOf[String]))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    store.merge(wipe)
    assert(store.snapshot().count() == 0)
    // the store dir now holds only the schema file — the next merge must
    // not fall over on schema inference (ADVICE r1)
    val revive = Seq((Cdc.Upsert, 6L, 7L, "seven"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    store.merge(revive)
    assert(store.snapshot().as[(Long, String)].collect().toSet == Set((7L, "seven")))
  }

  test("merge evolves the schema additively; missing batch columns fill null") {
    val dir = tmp("store")
    val store = newStore(dir)
    // batch carries a NEW column the store has never seen
    val widened = Seq(
      (Cdc.Upsert, 10L, 2L, "TWO", Some("extra2")),
      (Cdc.Upsert, 11L, 9L, "nine", Option.empty[String]))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload", "note")
    store.merge(widened)
    val snap1 = store.snapshot()
    assert(snap1.columns.toSeq == Seq("id", "payload", "note"))
    val m1 = snap1.as[(Long, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // untouched rows read the new column as null; merged rows carry it
    assert(m1(1L) == (("one", None)) && m1(2L) == (("TWO", Some("extra2"))))
    assert(m1(9L) == (("nine", None)))
    // a later batch in the OLD shape (no `note`) still merges; note -> null
    val narrow = Seq((Cdc.Upsert, 12L, 3L, "THREE"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    store.merge(narrow)
    val m2 = store.snapshot().as[(Long, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m2(3L) == (("THREE", None)) && m2(2L) == (("TWO", Some("extra2"))))
    assert(m2.keySet == Set(1L, 2L, 3L, 9L))
  }

  test("merges keep buckets consolidated; compact() preserves the snapshot") {
    val dir = tmp("store")
    val store = newStore(dir)
    // r9: the merge write is bucket-aligned (repartition on _bucket before
    // the staged write), so a COW rewrite leaves each touched bucket at
    // exactly ONE file — fragmentation no longer accumulates between
    // compactions (it used to grow one file per upstream partition per
    // bucket per merge, and the next merge re-read and re-fsynced all of
    // them). compact() remains the maintenance pass for MOR delta folding.
    (10L to 14L).foreach { tx =>
      store.merge(Seq((Cdc.Upsert, tx, tx, s"v$tx"))
        .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    }
    val before = store.snapshot().as[(Long, String)].collect().toSet
    def filesPerBucket: Map[String, Int] =
      new java.io.File(dir).listFiles((f: java.io.File) =>
          f.getName.startsWith("_bucket=")).map { d =>
        d.getName -> d.listFiles((f: java.io.File) =>
          f.getName.endsWith(".parquet")).length
      }.toMap
    assert(filesPerBucket.values.forall(_ == 1), filesPerBucket.toString)
    store.compact()
    assert(store.snapshot().as[(Long, String)].collect().toSet == before)
    assert(filesPerBucket.values.forall(_ == 1), filesPerBucket.toString)
  }

  test("merge backfill path (broadcastBatchKeys=false) converges identically") {
    // a backfill batch touching most keys must not broadcast its key set;
    // the shuffled anti-join produces the same store state (VERDICT r6 #6)
    val dir = tmp("store")
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4,
      broadcastBatchKeys = false)
    store.initialize(Cdc.initialLoad(
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "payload")))
    val folded = Seq(
      (Cdc.Upsert, 10L, 1L, "ONE"), (Cdc.Upsert, 11L, 2L, "TWO"),
      (Cdc.Delete, 12L, 3L, null.asInstanceOf[String]),
      (Cdc.Upsert, 13L, 9L, "nine")
    ).toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    store.merge(folded)
    val first = store.snapshot().as[(Long, String)].collect().toSet
    assert(first == Set((1L, "ONE"), (2L, "TWO"), (9L, "nine")))
    store.merge(folded) // replay stays idempotent on the shuffled path
    assert(store.snapshot().as[(Long, String)].collect().toSet == first)
  }

  test("crash between retire and promote: staged copy is recovered (ADVICE r6)") {
    val dir = tmp("store")
    val store = newStore(dir)
    val before = store.snapshot().as[(Long, String)].collect().toSet
    // reconstruct the exact mid-swap crash window: a bucket's staged
    // replacement is fully written and the live dir was already retired
    // (renamed aside) when the process died
    val root = new java.io.File(dir)
    val bucket = root.listFiles((f: java.io.File) =>
      f.getName.startsWith("_bucket=")).head
    val n = bucket.getName.stripPrefix("_bucket=")
    val stagedCopy = new java.io.File(new java.io.File(root, "_staging"), bucket.getName)
    stagedCopy.mkdirs()
    bucket.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(stagedCopy, f.getName).toPath)
    }
    java.nio.file.Files.move(bucket.toPath,
      new java.io.File(root, s"_retired_$n").toPath)
    // mid-swap crashes happen after the commit marker is dropped
    new java.io.File(root, "_swap_started").createNewFile()
    // live bucket dir is now missing — the old code's crash window would
    // have lost its rows permanently; recovery must promote the staged copy
    assert(store.snapshot().as[(Long, String)].collect().toSet == before)
    assert(!new java.io.File(root, "_staging").exists())
    assert(!new java.io.File(root, s"_retired_$n").exists())
    // and a subsequent merge over the healed store behaves normally
    store.merge(Seq((Cdc.Upsert, 50L, 2L, "TWO"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(store.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "TWO"), (3L, "three")))
  }

  test("crash before any swap: leftover staging is discarded, old buckets win") {
    val dir = tmp("store")
    val store = newStore(dir)
    val before = store.snapshot().as[(Long, String)].collect().toSet
    // staging fully written but the process died before the first rename:
    // every live bucket is intact, so the staged (uncommitted) data must be
    // dropped — the ledger never advanced and the window will replay
    val root = new java.io.File(dir)
    val bucket = root.listFiles((f: java.io.File) =>
      f.getName.startsWith("_bucket=")).head
    val stagedCopy = new java.io.File(new java.io.File(root, "_staging"), bucket.getName)
    stagedCopy.mkdirs()
    bucket.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(stagedCopy, f.getName).toPath)
    }
    assert(store.snapshot().as[(Long, String)].collect().toSet == before)
    assert(!new java.io.File(root, "_staging").exists())
  }

  test("pre-swap crash with a NEW bucket staged: uncommitted batch never leaks") {
    // the staging write completed (including a bucket the store never had)
    // but the process died before the commit marker / first rename: the
    // batch was never committed and the ledger never advanced — recovery
    // must DISCARD the staged new bucket, not promote it into snapshot()
    val dir = tmp("store")
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 4)
    store.initialize(Cdc.initialLoad(Seq((1L, "one")).toDF("id", "payload")))
    val before = store.snapshot().as[(Long, String)].collect().toSet
    val root = new java.io.File(dir)
    val live = root.listFiles((f: java.io.File) =>
      f.getName.startsWith("_bucket=")).map(_.getName).toSet
    val newBucket = (0 until 4).map(b => s"_bucket=$b").find(!live.contains(_)).get
    // stage a parquet dir for the never-existing bucket (copy a live one)
    val src = root.listFiles((f: java.io.File) =>
      f.getName.startsWith("_bucket=")).head
    val stagedCopy = new java.io.File(new java.io.File(root, "_staging"), newBucket)
    stagedCopy.mkdirs()
    src.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(stagedCopy, f.getName).toPath)
    }
    // NO _swap_started marker: this is the pre-commit window
    assert(store.snapshot().as[(Long, String)].collect().toSet == before)
    assert(!new java.io.File(root, "_staging").exists())
    assert(!new java.io.File(root, newBucket).exists())
  }

  test("retire-rename persisted but marker lost: old bucket restored, nothing lost") {
    // metadata-reordering power loss: the retire rename reached disk but
    // the _swap_started marker create did not — recovery must treat the
    // batch as uncommitted (discard staging) AND restore the retired copy,
    // never delete both
    val dir = tmp("store")
    val store = newStore(dir)
    val before = store.snapshot().as[(Long, String)].collect().toSet
    val root = new java.io.File(dir)
    val bucket = root.listFiles((f: java.io.File) =>
      f.getName.startsWith("_bucket=")).head
    val n = bucket.getName.stripPrefix("_bucket=")
    val stagedCopy = new java.io.File(new java.io.File(root, "_staging"), bucket.getName)
    stagedCopy.mkdirs()
    bucket.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(stagedCopy, f.getName).toPath)
    }
    java.nio.file.Files.move(bucket.toPath,
      new java.io.File(root, s"_retired_$n").toPath)
    // NO _swap_started marker on disk
    assert(store.snapshot().as[(Long, String)].collect().toSet == before)
    assert(!new java.io.File(root, "_staging").exists())
    assert(!new java.io.File(root, s"_retired_$n").exists())
    assert(new java.io.File(root, s"_bucket=$n").exists())
  }

  test("crash between promote and retired-delete: debris dropped, new data kept") {
    val dir = tmp("store")
    val store = newStore(dir)
    val before = store.snapshot().as[(Long, String)].collect().toSet
    // staged dir already promoted; the retired old copy was not yet deleted
    val root = new java.io.File(dir)
    val bucket = root.listFiles((f: java.io.File) =>
      f.getName.startsWith("_bucket=")).head
    val n = bucket.getName.stripPrefix("_bucket=")
    val retired = new java.io.File(root, s"_retired_$n")
    retired.mkdirs()
    bucket.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(retired, f.getName).toPath)
    }
    assert(store.snapshot().as[(Long, String)].collect().toSet == before)
    assert(!retired.exists())
  }

  test("merge leaves the session partitionOverwriteMode untouched") {
    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    val store = newStore(tmp("store"))
    store.merge(Seq((Cdc.Upsert, 10L, 2L, "TWO"))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload"))
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode") == before)
  }

  test("stale rows at/below the committed watermark are detected, not silent") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    val source = Seq((1L, "one"), (2L, "TWO")).toDF("id", "payload")
    val job = new CdcStreamJob(spark, () => source, store, ledger,
      Seq(("id", "id")))
    job.processBatch(keyFeed((2L, 10L)), 0)
    assert(ledger.read() == 10L && job.staleRowsSeen == 0L)
    // a late row with txid 9 <= committed 10 arrives in the NEXT batch:
    // excluded from the fold but counted (ADVICE r1)
    job.processBatch(keyFeed((1L, 9L), (2L, 11L)), 1)
    assert(job.staleRowsSeen == 1L)
    assert(ledger.read() == 11L)
  }

  test("CdcStreamJob end-to-end over a MOR store ≡ COW (fold, deletes, ledger)") {
    val source = Seq((1L, "one"), (2L, "TWO"), (3L, "three")).toDF("id", "payload")
    def runWith(mor: Boolean): (Set[(Long, String)], Long) = {
      val store = new UpsertStore(spark, tmp("jstore"), Seq("id"),
        numBuckets = 4, mergeOnRead = mor)
      store.initialize(Cdc.initialLoad(
        Seq((1L, "old1"), (9L, "old9")).toDF("id", "payload")))
      val ledger = new TxidLedger(tmp("jled") + "/txid")
      val job = new CdcStreamJob(spark, () => source, store, ledger,
        Seq(("id", "id")))
      job.processBatch(keyFeed((1L, 10L), (2L, 11L)), 0) // upserts from master
      job.processBatch(keyFeed((9L, 12L)), 1)            // 9 gone upstream → delete
      (store.snapshot().as[(Long, String)].collect().toSet, ledger.read())
    }
    val cow = runWith(false)
    val mor = runWith(true)
    assert(cow == mor)
    assert(cow == ((Set((1L, "one"), (2L, "TWO")), 12L)))
  }

  test("delete of a whole bucket leaves no stale rows") {
    val dir = tmp("store")
    val store = new UpsertStore(spark, dir, Seq("id"), numBuckets = 2)
    store.initialize(Cdc.initialLoad(Seq((1L, "a")).toDF("id", "payload")))
    val folded = Seq((Cdc.Delete, 5L, 1L, null.asInstanceOf[String]))
      .toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    store.merge(folded)
    assert(store.snapshot().count() == 0)
  }

  test("commit-order watermark: blocked by oldest in-flight txn, 2h horizon") {
    val log = feed((1L, "x", 100L), (2L, "y", 105L), (3L, "z", 110L))
    val now = 10000L
    // no open txns → max logged
    assert(Watermark.maxSafeTransactionId(log, Cdc.TransactionId, Nil, 0L, now) == 110L)
    // open txn at 106 → 105
    assert(Watermark.maxSafeTransactionId(log, Cdc.TransactionId,
      Seq(Watermark.OpenTxn(106L, now - 30)), 0L, now) == 105L)
    // stuck txn older than 2h is ignored
    assert(Watermark.maxSafeTransactionId(log, Cdc.TransactionId,
      Seq(Watermark.OpenTxn(106L, now - 7300)), 0L, now) == 110L)
    // watermark never regresses below `from`
    assert(Watermark.maxSafeTransactionId(log, Cdc.TransactionId,
      Seq(Watermark.OpenTxn(1L, now)), 50L, now) == 50L)
  }

  test("latency alerts mirror the 60s/5s thresholds") {
    val now = 1000L
    assert(Watermark.latencyAlert(Nil, now).isEmpty)
    assert(Watermark.latencyAlert(Seq(Watermark.OpenTxn(1, now - 3)), now).isEmpty)
    assert(Watermark.latencyAlert(Seq(Watermark.OpenTxn(1, now - 30)), now)
      .exists(_.startsWith("INFO")))
    assert(Watermark.latencyAlert(Seq(Watermark.OpenTxn(1, now - 90)), now)
      .exists(_.startsWith("WARN")))
  }

  // key-only change log (the PKLOG model): (id, txid)
  private def keyFeed(rows: (Long, Long)*) =
    rows.toDF("id", Cdc.TransactionId)

  test("processBatch: fold + merge + ledger advance; skip when no new txid") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    // source table has moved ahead of the replica: 2 updated, 4 inserted
    val source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (4L, "four"))
      .toDF("id", "payload")
    val job = new CdcStreamJob(spark, () => source, store, ledger,
      Seq(("id", "id")))
    job.processBatch(keyFeed((2L, 10L), (4L, 11L)), 0)
    assert(ledger.read() == 11L)
    assert(store.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "TWO"), (3L, "three"), (4L, "four")))
    // replay the same feed: window (11, 11] is empty → no-op
    job.processBatch(keyFeed((2L, 10L), (4L, 11L)), 1)
    assert(ledger.read() == 11L)
  }

  test("deleted source row folds to D and leaves the replica") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    val source = Seq((1L, "one"), (2L, "two")).toDF("id", "payload") // 3 gone
    val job = new CdcStreamJob(spark, () => source, store, ledger,
      Seq(("id", "id")))
    job.processBatch(keyFeed((3L, 20L)), 0)
    assert(store.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "two")))
  }

  test("open txn caps the LEDGER, not the fold: delivered rows apply, watermark waits") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    var source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"))
      .toDF("id", "payload")
    var open: Seq[Watermark.OpenTxn] = Seq(Watermark.OpenTxn(11L, 9990L))
    val job = new CdcStreamJob(spark, () => source, store, ledger,
      Seq(("id", "id")), openTxns = () => open, nowEpochSec = () => 10000L)
    // txid 12 was DELIVERED (its txn committed) while txn 11 is still open:
    // the row folds now (source has no key 5 yet → delete no-op) but the
    // ledger stops at 10 — never past the oldest open transaction
    job.processBatch(keyFeed((2L, 10L), (5L, 12L)), 0)
    assert(ledger.read() == 10L)
    assert(!store.snapshot().as[(Long, String)].collect().toMap.contains(5L))
    // txn 11 commits (and key 5's row is now in the source): the re-poll
    // re-reads the window above the conservative ledger and converges
    open = Nil
    source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (5L, "five"))
      .toDF("id", "payload")
    job.processBatch(keyFeed((2L, 10L), (5L, 12L)), 1)
    assert(ledger.read() == 12L)
    assert(store.snapshot().as[(Long, String)].collect().toMap.get(5L)
      .contains("five"))
  }

  test("push feed: late-committing txn below the seen max still folds (ADVICE r2)") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    var source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"))
      .toDF("id", "payload")
    // txn 6 stays open throughout, pinning the safe watermark at 5
    val open = Seq(Watermark.OpenTxn(6L, 9990L))
    val job = new CdcStreamJob(spark, () => source, store, ledger,
      Seq(("id", "id")), openTxns = () => open, nowEpochSec = () => 10000L)
    // batch 0: txn 10 committed → folds, ledger capped at 5, appliedHi = 10
    job.processBatch(keyFeed((2L, 10L)), 0)
    assert(ledger.read() == 5L)
    // batch 1: txn 8 commits LATE (txid assigned at start, delivered at
    // commit) — txid 8 ≤ appliedHi 10 and safe 5 ≤ from 5, the exact shape
    // the old no-op guard skipped. Push batches are never re-delivered, so
    // the row must fold NOW.
    source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (5L, "five"))
      .toDF("id", "payload")
    job.processBatch(keyFeed((5L, 8L)), 1)
    assert(store.snapshot().as[(Long, String)].collect().toMap.get(5L)
      .contains("five"))
    assert(ledger.read() == 5L) // still capped by the open txn
  }

  test("pull mode: pinned-watermark re-poll skips the redundant re-fold") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    var sourceReads = 0
    val source = Seq((1L, "one"), (2L, "TWO")).toDF("id", "payload")
    val open = Seq(Watermark.OpenTxn(6L, 9990L))
    val job = new CdcStreamJob(spark, () => { sourceReads += 1; source }, store,
      ledger, Seq(("id", "id")), openTxns = () => open,
      nowEpochSec = () => 10000L, pullMode = true)
    job.processBatch(keyFeed((2L, 10L)), 0)
    assert(sourceReads == 1 && ledger.read() == 5L)
    // pull mode re-reads the same window while txn 6 pins the watermark:
    // nothing new → the fold (and its bucket rewrite) is skipped entirely
    job.processBatch(keyFeed((2L, 10L)), 1)
    assert(sourceReads == 1 && ledger.read() == 5L)
  }

  test("end-to-end via Structured Streaming MemoryStream") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    @volatile var source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"),
      (9L, "nine")).toDF("id", "payload")
    val job = new CdcStreamJob(spark, () => source, store, ledger,
      Seq(("id", "id")))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = job.start(ms.toDF().toDF("id", Cdc.TransactionId), tmp("ckpt"))
    ms.addData((2L, 20L), (9L, 21L))
    q.processAllAvailable()
    source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (9L, "NINE"))
      .toDF("id", "payload")
    ms.addData((9L, 22L))
    q.processAllAvailable()
    q.stop()
    val got = store.snapshot().as[(Long, String)].collect().toMap
    assert(ledger.read() == 22L)
    assert(got(2L) == "TWO" && got(9L) == "NINE")
  }

  test("streaming restart from checkpoint resumes without reprocessing (ST6)") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    val ckpt = tmp("ckpt")
    @volatile var source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"))
      .toDF("id", "payload")
    var batches = 0
    val job = new CdcStreamJob(spark, () => { batches += 1; source }, store,
      ledger, Seq(("id", "id")))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q1 = job.start(ms.toDF().toDF("id", Cdc.TransactionId), ckpt)
    ms.addData((2L, 20L))
    q1.processAllAvailable()
    q1.stop()
    assert(ledger.read() == 20L)
    val afterFirst = batches
    // restart: SAME checkpoint + stream; the committed batch is not redone
    source = Seq((1L, "one"), (2L, "TWO"), (3L, "THREE")).toDF("id", "payload")
    val q2 = job.start(ms.toDF().toDF("id", Cdc.TransactionId), ckpt)
    ms.addData((3L, 21L))
    q2.processAllAvailable()
    q2.stop()
    assert(ledger.read() == 21L)
    assert(store.snapshot().as[(Long, String)].collect().toMap ==
      Map(1L -> "one", 2L -> "TWO", 3L -> "THREE"))
    // only the new data triggered folds after restart (empty-batch skips
    // don't call source())
    assert(batches == afterFirst + 1)
  }

  test("backfill via Trigger.AvailableNow drains the feed and terminates") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledger = new TxidLedger(tmp("ledger") + "/txid")
    val source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (9L, "nine"))
      .toDF("id", "payload")
    val job = new CdcStreamJob(spark, () => source, store, ledger,
      Seq(("id", "id")))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    ms.addData((2L, 20L), (9L, 21L)) // data queued BEFORE the query starts
    val q = job.startBackfill(ms.toDF().toDF("id", Cdc.TransactionId), tmp("ckpt"))
    q.awaitTermination(60000) // AvailableNow terminates after the drain
    assert(!q.isActive)
    assert(ledger.read() == 21L)
    assert(store.snapshot().as[(Long, String)].collect().toMap ==
      Map(1L -> "one", 2L -> "TWO", 3L -> "three", 9L -> "nine"))
  }

  test("producer → Kafka wire → consumer: full CDC pipeline converges") {
    // §3.1 end-to-end: delta fold (producer) → (key,value) records (wire)
    // → parse (consumer) → last-write-wins apply into the replica
    val store = newStore(tmp("store"))
    val source = Seq((1L, "one"), (2L, "TWO"), (4L, "four"))
      .toDF("id", "payload") // 3 deleted, 2 updated, 4 inserted
    val folded = graft.cdc.Cdc.delta(
      keyFeed((2L, 10L), (3L, 11L), (4L, 12L)),
      source, Seq(("id", "id")), lo = 0L, hi = 100L)
    val records = graft.sources.KafkaIO.toRecords(folded, Seq("id"))
    val received = graft.sources.KafkaIO.fromRecords(records, folded.schema)
    CdcApply.applyChanges(store, received, Seq("id"))
    assert(store.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "TWO"), (4L, "four")))
  }

  test("consumer-side apply: envelope feed folds last-write-wins into store") {
    val dir = tmp("store")
    val store = newStore(dir)
    val batch = Seq(
      (Cdc.Upsert, 30L, 2L, "v30"),
      (Cdc.Upsert, 31L, 2L, "v31"),   // later change to same key wins
      (Cdc.Delete, 32L, 3L, null.asInstanceOf[String]),
      (Cdc.Upsert, 33L, 7L, "seven")
    ).toDF(Cdc.ChangeType, Cdc.TransactionId, "id", "payload")
    CdcApply.applyChanges(store, batch, Seq("id"))
    assert(store.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "v31"), (7L, "seven")))
  }

  test("crash between sink commit and ledger advance: replay converges (ST4)") {
    val dir = tmp("store")
    val store = newStore(dir)
    val ledgerPath = tmp("ledger") + "/txid"
    val ledger = new TxidLedger(ledgerPath)
    val source = Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (7L, "seven"))
      .toDF("id", "payload")
    // simulate the crash: the fold + merge land, but the process dies
    // BEFORE ledger.commit — exactly what processBatch orders guarantee
    val folded = graft.cdc.Cdc.delta(keyFeed((2L, 10L), (7L, 11L)),
      source, Seq(("id", "id")), lo = -1L, hi = 11L)
    store.merge(folded)
    assert(ledger.read() == -1L) // watermark did NOT advance
    val afterCrash = store.snapshot().as[(Long, String)].collect().toSet
    // restart: a fresh job re-reads the same window and replays the merge
    val job = new CdcStreamJob(spark, () => source, store, ledger,
      Seq(("id", "id")))
    job.processBatch(keyFeed((2L, 10L), (7L, 11L)), 0)
    assert(ledger.read() == 11L)
    // idempotent merge → no divergence vs the pre-crash state
    assert(store.snapshot().as[(Long, String)].collect().toSet == afterCrash)
    assert(afterCrash ==
      Set((1L, "one"), (2L, "TWO"), (3L, "three"), (7L, "seven")))
  }

  test("statefulDedup: streaming latest-per-key suppresses replays and stale rows") {
    import StatefulDedup.KeyedChange
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedChange]
    val out = StatefulDedup.latestPerKey(ms.toDS(), stateTtl = "")
    val q = out.writeStream.format("memory").queryName("sd_out")
      .outputMode("update").start(tmp("sd_ckpt"))
    // batch 1: two changes to k1 (only txid 12 survives the in-batch fold)
    ms.addData(KeyedChange("k1", 11, "A", "v11"), KeyedChange("k1", 12, "A", "v12"),
      KeyedChange("k2", 5, "A", "w5"))
    q.processAllAvailable()
    // batch 2: replay of txid 12 (suppressed), stale txid 3 (suppressed),
    // genuine advance on k2
    ms.addData(KeyedChange("k1", 12, "A", "v12"), KeyedChange("k2", 3, "A", "stale"),
      KeyedChange("k2", 9, "D", "w9"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sd_out").as[KeyedChange].collect()
      .map(r => (r.key, r.txid, r.payload)).toSet
    assert(got == Set(("k1", 12L, "v12"), ("k2", 5L, "w5"), ("k2", 9L, "w9")))
  }

  test("statefulDedup rows: full envelope rows with a composite typed key") {
    implicit val sqlCtx = spark.sqlContext
    // the full-row form: composite (string, long) key, envelope + payload
    // columns survive to the output unchanged
    val ms = MemoryStream[(String, Long, Long, String, Double)]
    val feed = ms.toDF().toDF("mandt", "id", "_transactionid", "_change_type", "amount")
    val out = StatefulDedup.latestPerKeyRows(feed, Seq("mandt", "id"))
    val q = out.writeStream.format("memory").queryName("sdr_out")
      .outputMode("update").start(tmp("sdr_ckpt"))
    ms.addData(("100", 1L, 11L, "A", 1.5), ("100", 1L, 12L, "A", 2.5),
      ("200", 1L, 5L, "A", 9.0))
    q.processAllAvailable()
    // replay of (100,1,12) suppressed; stale txid on (200,1) suppressed;
    // genuine delete advance on (200,1)
    ms.addData(("100", 1L, 12L, "A", 2.5), ("200", 1L, 3L, "A", -1.0),
      ("200", 1L, 9L, "D", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdr_out")
      .as[(String, Long, Long, String, Double)].collect().toSet
    assert(got == Set(("100", 1L, 12L, "A", 2.5),
      ("200", 1L, 5L, "A", 9.0), ("200", 1L, 9L, "D", 0.0)))
    assert(spark.table("sdr_out").schema.fieldNames.toSeq ==
      Seq("mandt", "id", "_transactionid", "_change_type", "amount"))
  }

  test("built-in dropDuplicatesWithinWatermark suppresses replays (ST4)") {
    // the native companion to StatefulDedup: replayed (id, txid) pairs
    // within the watermark horizon are emitted once
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)] // (id, txid, epoch sec)
    val deduped = ms.toDF().toDF("id", "txid", "sec")
      .select($"id", $"txid", timestamp_seconds($"sec").as("ts"))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id", "txid")
    val q = deduped.writeStream.format("memory").queryName("ddw_out")
      .outputMode("append").start(tmp("ddw_ckpt"))
    ms.addData((1L, 10L, 100L), (1L, 10L, 100L), (2L, 11L, 100L))
    q.processAllAvailable()
    ms.addData((1L, 10L, 101L), (1L, 12L, 102L)) // replay + genuine advance
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ddw_out").select($"id", $"txid")
      .as[(Long, Long)].collect().toList.sorted
    assert(got == List((1L, 10L), (1L, 12L), (2L, 11L)))
  }

  test("latency listener thresholds mirror ST3 (60s warn / 5s info)") {
    assert(LatencyListener.alertLevel(2).isEmpty)
    assert(LatencyListener.alertLevel(30).contains("INFO"))
    assert(LatencyListener.alertLevel(90).contains("WARN"))
    // listener wiring: alerts flow through the callback on slow batches
    var alerts = List.empty[String]
    val l = new LatencyListener(msg => alerts ::= msg)
    assert(l.lastBatchMs == -1L)
  }

  test("stream-stream interval join with watermarks (ST8 extension)") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long)]   // (ad_id, epoch sec)
    val clicks = MemoryStream[(Long, Long)]
    val impDf = imps.toDF().toDF("ad_id", "sec")
      .select($"ad_id", timestamp_seconds($"sec").as("imp_ts"))
      .withWatermark("imp_ts", "10 seconds")
    val clickDf = clicks.toDF().toDF("ad_id", "sec")
      .select($"ad_id".as("c_ad_id"), timestamp_seconds($"sec").as("click_ts"))
      .withWatermark("click_ts", "10 seconds")
    // attribute a click to an impression within [imp_ts, imp_ts + 30s]
    val joined = impDf.join(clickDf,
      $"ad_id" === $"c_ad_id" &&
        $"click_ts" >= $"imp_ts" && $"click_ts" <= $"imp_ts" + expr("INTERVAL 30 SECONDS"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start(tmp("ssj_ckpt"))
    imps.addData((1L, 100L), (2L, 100L))
    clicks.addData((1L, 120L), (2L, 140L), (1L, 95L)) // 2@140 outside, 1@95 before
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").select($"ad_id").as[Long].collect().toList
    assert(got == List(1L)) // only ad 1's click lands in its window
  }

  test("event-time windows: tumbling + session (ST8 extension)") {
    val ev = Seq(
      ("2024-01-01 00:00:10", "a", 1.0),
      ("2024-01-01 00:00:50", "a", 2.0),
      ("2024-01-01 00:05:10", "a", 3.0),
      ("2024-01-01 00:00:30", "b", 4.0)
    ).toDF("ts_s", "k", "value")
      .select(to_timestamp($"ts_s").alias("ts"), $"k", $"value")
    val tumbling = EventWindows.tumblingCounts(ev, "ts", "k", "1 minute",
      "10 minutes", sumCol = Some("value"))
    val rows = tumbling.select($"k", $"n", $"sum_value").as[(String, Long, Double)]
      .collect().toSet
    assert(rows == Set(("a", 2L, 3.0), ("a", 1L, 3.0), ("b", 1L, 4.0)))
    val sessions = EventWindows.sessionCounts(ev, "ts", "k", "2 minutes", "10 minutes")
    val s = sessions.select($"k", $"n").as[(String, Long)].collect().toSet
    assert(s == Set(("a", 2L), ("a", 1L), ("b", 1L)))
  }

  // r12 regression pin for the multi-writer maintenance contract: the
  // stream loop absorbs a compaction that LOSES the concurrent-
  // maintenance race (the winner paid the debt; re-check next batch),
  // but a conflict from the DATA path must still surface — merges always
  // rebase, so one escaping means the rebase protocol itself broke.
  private class ScriptedStore(
      mergeFails: Boolean, compactFails: Boolean) extends KeyedUpsertStore {
    var merges = 0
    var compactChecks = 0
    import org.apache.spark.sql.DataFrame
    def initialize(initialLoad: DataFrame): Unit = ()
    def merge(folded: DataFrame): Unit = {
      folded.count() // consume, like a real sink
      if (mergeFails) throw new CommitConflictException("merge rebase exhausted")
      merges += 1
    }
    def snapshot(): DataFrame = spark.emptyDataFrame
    def feedVersion: Long = merges.toLong
    def changesBetween(from: Long, to: Long): DataFrame = spark.emptyDataFrame
    def compactIfNeeded(maxDeltas: Int): Boolean = {
      compactChecks += 1
      if (compactFails) throw new CommitConflictException("lost maintenance race")
      false
    }
    def compactIfDeltaRatio(maxRatio: Double): Boolean = false
  }

  test("compaction losing the concurrent-maintenance race is a policy no-op (r12)") {
    val store = new ScriptedStore(mergeFails = false, compactFails = true)
    val ledger = new TxidLedger(tmp("absorb") + "/txid.ledger")
    val job = new CdcStreamJob(spark,
      source = () => Seq((1L, "one")).toDF("id", "payload"),
      store = store, ledger = ledger, keyJoin = Seq("id" -> "id"),
      autoCompactDeltas = Some(1))
    job.processBatch(feed((1L, "x", 10L)), 0L) // must not surface
    assert(store.merges == 1, "the data commit must have landed")
    assert(store.compactChecks == 1, "the policy must have run and lost")
    assert(ledger.read() == 10L,
      "the ledger advance precedes maintenance and must survive the lost race")
    job.processBatch(feed((1L, "y", 20L)), 1L) // loop keeps going
    assert(store.merges == 2 && store.compactChecks == 2)
  }

  test("a conflict from the merge path still surfaces (never absorbed)") {
    val store = new ScriptedStore(mergeFails = true, compactFails = false)
    val job = new CdcStreamJob(spark,
      source = () => Seq((1L, "one")).toDF("id", "payload"),
      store = store, ledger = new TxidLedger(tmp("surface") + "/txid.ledger"),
      keyJoin = Seq("id" -> "id"), autoCompactDeltas = Some(1))
    intercept[CommitConflictException] {
      job.processBatch(feed((1L, "x", 10L)), 0L)
    }
    assert(store.compactChecks == 0, "maintenance must not run after a failed commit")
  }
}
