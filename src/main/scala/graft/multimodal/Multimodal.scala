package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, processed by batched `mapPartitions` stages (the Scala
  * analog of arrow-batched pandas UDFs — one decoder/model invocation per
  * batch, not per row).
  *
  * The IMAGE half is REAL since r11 ([[ImageCodec]], JDK `javax.imageio` —
  * zero new dependencies): an image-mimed asset whose bytes actually parse
  * as PNG/BMP/GIF/JPEG is decoded to true pixels, and metadata, the 8×8
  * luma grid, perceptual hashing, resizing, and pixel features all run
  * over that raster. Audio/video calls remain STUBS (`StubCodecs` —
  * deterministic fakes; this container has no such codecs), as does an
  * image payload that fails to parse (the fixture tables carry text bytes
  * as stand-in payloads; a production deployment would route parse
  * failures to a quarantine channel instead). Everything Spark-side —
  * schemas, encoders, batch shapes, partition sizing, the explode for
  * frame sampling — is real and tested either way; swapping the remaining
  * stubs for a JNI/ONNX call changes one function body.
  */
object Multimodal {

  /** A media asset row: opaque payload + mime + source metadata. */
  case class Asset(asset_id: Long, media: Array[Byte], mime: String)

  /** Decoded metadata (what a real codec would return). */
  case class DecodedAsset(asset_id: Long, media: Array[Byte], mime: String,
      width: Int, height: Int, n_frames: Int, duration_ms: Long)

  /** Extracted feature row. */
  case class AssetFeatures(asset_id: Long, features: Array[Float])

  /** A sampled frame. */
  case class Frame(asset_id: Long, frame_idx: Int, frame: Array[Byte])

  /** REAL audio signal features (integer-exact; see [[AudioCodec]]). */
  case class AudioSignal(asset_id: Long, sample_rate: Int, channels: Int,
      n_samples: Int, energy: Long, zero_crossings: Int)

  /** Deterministic fake codecs — STUB layer. A real deployment implements
    * these against image/audio libraries; signatures and batch shapes are
    * the contract.
    */
  object StubCodecs {
    private def h(bytes: Array[Byte], salt: Long): Long = {
      var acc = salt
      var i = 0
      while (i < bytes.length) { acc = acc * 31 + bytes(i); i += 1 }
      graft.functions.SketchOps.splitmix64(acc)
    }

    /** STUB decode: a real implementation parses the container header. */
    def decode(a: Asset): DecodedAsset = {
      val x = h(a.media, 1)
      DecodedAsset(a.asset_id, a.media, a.mime,
        width = 64 + (x & 0x3ff).toInt,
        height = 64 + ((x >>> 10) & 0x3ff).toInt,
        n_frames = if (a.mime.startsWith("video")) 1 + ((x >>> 20) & 0xff).toInt else 1,
        duration_ms = if (a.mime.startsWith("image")) 0 else ((x >>> 28) & 0xffff).toLong)
    }

    /** STUB feature extraction: a real implementation batches through an
      * embedding model. Deterministic unit-normalized vector from bytes.
      */
    def features(a: Asset, dim: Int): Array[Float] = {
      val raw = Array.tabulate(dim)(i => {
        val v = h(a.media, 1000 + i)
        (v.toDouble / Long.MaxValue).toFloat
      })
      val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      if (norm == 0) raw else raw.map(_ / norm)
    }

    /** STUB resize: a real implementation re-encodes pixels. Here: tag the
      * payload with the target size (keeps bytes opaque, changes metadata).
      */
    def resize(d: DecodedAsset, w: Int, hgt: Int): DecodedAsset =
      d.copy(width = w, height = hgt,
        media = d.media.take(math.max(1, d.media.length / 2)))

    /** STUB frame extraction: a real implementation seeks + decodes. */
    def frame(a: Asset, idx: Int): Array[Byte] = {
      val x = h(a.media, 2000 + idx)
      Array.tabulate(8)(i => ((x >>> (8 * i)) & 0xff).toByte)
    }

    /** STUB 8×8 luma grid: what a real decoder produces by
      * decode → grayscale → resize(8,8). Deterministic from the bytes.
      */
    def grid8(a: Asset): Array[Int] =
      Array.tabulate(64)(i => ((h(a.media, 3000 + i / 8) >>> (8 * (i % 8))) & 0xff).toInt)

    /** Perceptual hash of an asset = [[averageHash]] over the (stub)
      * pixel grid. Swapping `grid8` for a real decoder upgrades this to a
      * true image aHash without touching the hash or the pair machinery.
      */
    def phash64(a: Asset): Long = averageHash(grid8(a))
  }

  /** Average-hash over an 8×8 luma grid — bit i is set iff pixel i is
    * strictly above the grid mean. This half is NOT a stub: it is the
    * standard aHash bit rule, and its key property — k pixel cells
    * flipping across the mean moves the hash by ≤ k Hamming bits — is what
    * makes Hamming banding a sound image near-dup filter.
    */
  def averageHash(grid: Array[Int]): Long = {
    require(grid.length == 64, s"grid must be 8x8, got ${grid.length}")
    var sum = 0L
    var i = 0
    while (i < 64) { sum += grid(i); i += 1 }
    // integer threshold: pixel > floor(mean) — avoids float comparison
    // drift across platforms
    val thr = sum / 64
    var out = 0L
    i = 0
    while (i < 64) {
      if (grid(i) > thr) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Decode an asset's pixels when it is a REAL image: mime says image
    * and the bytes parse. The single routing point for the real-vs-stub
    * seam.
    */
  def decodePixels(a: Asset): Option[(Int, Int, Array[Int])] =
    if (a.mime.startsWith("image/")) ImageCodec.decodeLuma(a.media) else None

  /** 8×8 luma grid: REAL pixels for decodable images, stub otherwise. */
  def pixelGrid8(a: Asset): Array[Int] = decodePixels(a) match {
    case Some((w, h, pix)) => ImageCodec.grid8(pix, w, h)
    case None => StubCodecs.grid8(a)
  }

  /** Perceptual hash over the REAL (or, for non-images, stub) grid. */
  def phash64(a: Asset): Long = averageHash(pixelGrid8(a))

  /** Image near-duplicate pairs: perceptual-hash each asset (batched
    * mapPartitions — the decode seam), then recover all pairs within
    * `maxHamming` bits through [[graft.operators.Dedup.hammingNearDups]]'s
    * complete pigeonhole banding. Per-asset work is O(bytes); the pair
    * stage is bucket-local — the same never-quadratic shape as the text
    * path, so a billion-image corpus costs one fingerprint scan plus a
    * banded self-join on 8-byte keys.
    */
  def imageNearDups(assets: Dataset[Asset], maxHamming: Int = 3,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    import assets.sparkSession.implicits._
    val fps = assets.mapPartitions(_.map(a => (a.asset_id, phash64(a))))
      .toDF("asset_id", "phash")
    graft.operators.Dedup.hammingNearDups(fps, "asset_id", "phash", maxHamming, maxBucket)
  }

  /** Decode metadata for every asset — REAL header/pixel parse for
    * decodable images, stub for everything else. Batched per partition;
    * one iterator pass, no per-row task overhead.
    */
  def decode(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeOne))
  }

  /** Decode an asset's PCM when it is a REAL audio file: mime says audio
    * and the bytes parse as 16-bit PCM. The audio twin of
    * [[decodePixels]].
    */
  def decodeSamples(a: Asset): Option[(Int, Int, Array[Short])] =
    if (a.mime.startsWith("audio/")) AudioCodec.decodePcm16(a.media) else None

  /** Parse an asset's MP4 CONTAINER when it is a real video file: mime
    * says video and the ISO-BMFF boxes parse. The video third of the
    * routing seam — container metadata and frame-payload extraction are
    * real; only the codec decode of a frame's bytes stays stubbed.
    */
  def decodeContainer(a: Asset): Option[IsoBmff.Mp4Meta] =
    if (a.mime.startsWith("video/")) IsoBmff.parse(a.media) else None

  /** Single-asset decode: the real-vs-stub routing applied to metadata.
    * Real audio reports (sampleRate, channels) through the (width,
    * height) slots — documented overload of the generic media-geometry
    * fields, the same way parquet stats columns are reused per type —
    * with true duration from the sample count.
    */
  def decodeOne(a: Asset): DecodedAsset = decodePixels(a) match {
    case Some((w, h, _)) =>
      DecodedAsset(a.asset_id, a.media, a.mime, width = w, height = h,
        n_frames = 1, duration_ms = 0L)
    case None => decodeSamples(a) match {
      case Some((rate, channels, samples)) =>
        // divisor in LONG: the codec enforces mono + a bounded rate, but
        // this math must not depend on that for its own safety
        DecodedAsset(a.asset_id, a.media, a.mime, width = rate,
          height = channels, n_frames = 1,
          duration_ms =
            samples.length.toLong * 1000 / (rate.toLong * channels))
      case None => decodeContainer(a) match {
        case Some(m) =>
          DecodedAsset(a.asset_id, a.media, a.mime, width = m.width,
            height = m.height, n_frames = m.nFrames,
            duration_ms = m.durationMs)
        case None => StubCodecs.decode(a)
      }
    }
  }

  /** REAL resize for decodable images: area-mean downsample of the true
    * raster, re-encoded as PNG. Non-images (and undecodable payloads)
    * keep the stub behavior.
    */
  def resizeOne(d: DecodedAsset, w: Int, hgt: Int): DecodedAsset =
    decodePixels(Asset(d.asset_id, d.media, d.mime)) match {
      case Some((sw, sh, pix)) if sw >= w && sh >= hgt =>
        val small = ImageCodec.downsample(pix, sw, sh, w, hgt)
        d.copy(width = w, height = hgt,
          media = ImageCodec.encodeGrayPng(small, w, hgt))
      case _ => StubCodecs.resize(d, w, hgt)
    }

  /** Feature extraction with an explicit model batch size: rows are grouped
    * into `batchSize` chunks per partition — the shape a vectorized model
    * call needs (the arrow-batch analog).
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 64,
      batchSize: Int = 32): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(batchSize).flatMap { batch =>
      // a real model runs ONE forward pass over `batch` here
      batch.map(a => AssetFeatures(a.asset_id, StubCodecs.features(a, dim)))
    })
  }

  /** REAL pixel features for decodable images: the 16-bin luma histogram
    * ([[ImageCodec.lumaHistogram16]]) — actual feature extraction over
    * actual pixels, batched exactly like [[extractFeatures]]. Assets that
    * don't decode fall back to the stub model vector so the output schema
    * is total.
    */
  def pixelFeatures(assets: Dataset[Asset],
      batchSize: Int = 32): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(batchSize).flatMap { batch =>
      batch.map { a =>
        AssetFeatures(a.asset_id, decodePixels(a) match {
          case Some((_, _, pix)) => ImageCodec.lumaHistogram16(pix)
          case None => StubCodecs.features(a, 16)
        })
      }
    })
  }

  /** REAL signal features for decodable PCM audio: integer energy and
    * zero-crossing counts over the true samples, batched like every other
    * media stage. Assets that don't parse as 16-bit PCM are DROPPED —
    * this is the analysis path for a decoded-audio corpus, and a
    * quarantine channel (not a fake row) is the production story for
    * undecodable payloads.
    */
  def audioSignals(assets: Dataset[Asset]): Dataset[AudioSignal] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      decodeSamples(a).map { case (rate, channels, samples) =>
        AudioSignal(a.asset_id, rate, channels, samples.length,
          AudioCodec.energy(samples), AudioCodec.zeroCrossings(samples))
      }
    })
  }

  /** Sample up to `n` evenly spaced frames per video asset (images yield
    * frame 0 only). Output is one row per frame — downstream ops fan out.
    */
  def sampleFrames(assets: Dataset[Asset], n: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      val container = decodeContainer(a)
      val total = container.map(_.nFrames).getOrElse(decodeOne(a).n_frames)
      val take = math.min(n, total)
      val step = math.max(1, total / math.max(take, 1))
      (0 until take).map { i =>
        val idx = i * step
        // REAL frame-payload extraction for parseable MP4s (the mdat
        // slice the stsz/stco tables address); stub bytes otherwise
        val payload = container match {
          case Some(m) => IsoBmff.sampleBytes(a.media, m, idx)
          case None => StubCodecs.frame(a, idx)
        }
        Frame(a.asset_id, idx, payload)
      }
    })
  }

  /** Closed-form fixture raster: pixel k of doc `id`'s 16×16 image.
    * Chosen (measured over the sf0.1 corpus) so every doc's perceptual
    * hash is DISTINCT with zero accidental near-pairs — a linear ramp
    * formula made all images structurally identical up to brightness and
    * collapsed 5000 docs onto 176 phashes (≈325k bogus "near-dup" pairs).
    * The quadratic-residue scramble keeps the arithmetic pure-integer
    * (every op replayable as SQL: `*`, `%`, left-associative) while
    * giving phash-diverse images.
    */
  def fixturePixel(id: Long, k: Int): Int =
    (((id + 1) * (k + 17) % 65521 * (k + 29) % 65521 + id * 31) % 256).toInt

  /** REAL-image asset table from the documents fixture: each doc becomes
    * a genuine 16×16 grayscale PNG (full ImageIO encode) whose pixel
    * raster is [[fixturePixel]] — a closed-form integer function of the
    * row, so an external engine can recompute every decoded pixel WITHOUT
    * a PNG parser while the Spark side exercises the real codec both ways
    * (encode here, [[ImageCodec.decodeLuma]] in the pipeline under test).
    * This is the fixture trick that graduates the image gates from
    * rows-only to hash-gated: the arithmetic is the oracle, the codec is
    * the code under test.
    */
  def realPngAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val pix = Array.tabulate(256)(k => fixturePixel(id, k))
        Asset(id, ImageCodec.encodeGrayPng(pix, 16, 16), "image/png")
      })
  }

  /** NEAR-duplicate plants for the image near-dup gates: docs in
    * `[loId, hiId)` re-encoded with the top-left and bottom-right 2×2
    * pixel blocks SWAPPED, published under `id + offset`. A swap keeps
    * the raster SUM — hence the aHash threshold — exactly unchanged, so
    * only the two touched grid cells can flip: each plant is guaranteed
    * within 2 Hamming bits of its source (forcing blocks to extremes
    * instead moves the mean and can flip borderline cells anywhere).
    * Deterministic nonzero-distance pairs the oracle replays from the
    * same arithmetic.
    */
  def noisyPngPlants(spark: SparkSession, docs: DataFrame,
      loId: Long, hiId: Long, offset: Long): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .filter(id => id >= loId && id < hiId)
      .mapPartitions(_.map { id =>
        val pix = Array.tabulate(256)(k => fixturePixel(id, swapIdx(k)))
        Asset(id + offset, ImageCodec.encodeGrayPng(pix, 16, 16), "image/png")
      })
  }

  /** Closed-form fixture PCM: sample k of doc `id`'s mono 16-bit signal —
    * a quadratic-residue scramble shifted to [-2000, 2000], so energy and
    * zero-crossing arithmetic stays exactly replayable in SQL (the audio
    * twin of [[fixturePixel]]).
    */
  def fixtureSample(id: Long, k: Int): Short =
    (((id * 37 + k.toLong * k * 11 + 13) % 4001) - 2000).toShort

  /** REAL-audio asset table: each doc becomes a genuine 8 kHz mono WAV
    * (full `AudioSystem` encode) of 256 closed-form samples — the same
    * fixture trick as [[realPngAssets]], applied to the audio codec.
    */
  def realWavAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val pcm = Array.tabulate(256)(k => fixtureSample(id, k))
        Asset(id, AudioCodec.encodeWavPcm16(pcm, 8000), "audio/wav")
      })
  }

  /** REAL-video asset table: each doc becomes a genuine minimal MP4
    * (ISO-BMFF boxes written per the public spec, parsed back by
    * [[IsoBmff.parse]]) whose frame count, frame sizes, dimensions and
    * duration are closed-form functions of the row — the image/audio
    * fixture trick applied to the video container. Frame PAYLOADS are
    * deterministic filler (the codec layer is the one remaining stub);
    * their SIZES are the oracle-checked surface.
    */
  def realMp4Assets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (2 + id % 7).toInt
        val frames = Array.tabulate(n) { i =>
          val len = (8 + (id * 7 + i * 3) % 32).toInt
          Array.tabulate(len)(j => ((id + i * 31 + j) % 256).toByte)
        }
        Asset(id, IsoBmff.encodeMp4(frames, timescale = 1000,
          duration = n * 40L, width = (320 + id % 16).toInt,
          height = (240 + id % 9).toInt), "video/mp4")
      })
  }

  /** The plant perturbation: top-left 2×2 block ↔ bottom-right 2×2 block
    * ((r, c) ↔ (r+14, c+14) for r, c ∈ {0, 1}); all other pixels fixed.
    */
  def swapIdx(k: Int): Int = {
    val r = k / 16
    val c = k % 16
    if (r <= 1 && c <= 1) (r + 14) * 16 + (c + 14)
    else if (r >= 14 && c >= 14) (r - 14) * 16 + (c - 14)
    else k
  }

  /** Build an asset table from the documents fixture (text bytes stand in
    * for media payloads; mime rotates deterministically).
    */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(
      col("doc_id").alias("asset_id"),
      col("text").cast("binary").alias("media"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).alias("mime"))
      .as[Asset]
  }
}
