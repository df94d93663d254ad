package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromDocuments(spark,
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("assetsFromDocuments: binary payload + rotating mime") {
    val rows = assets.limit(6).collect()
    assert(rows.forall(_.media.nonEmpty))
    assert(rows.map(_.mime).toSet.subsetOf(
      Set("image/png", "audio/wav", "video/mp4")))
    // mime assignment is keyed by id, deterministic
    val again = assets.limit(6).collect()
    assert(rows.map(r => r.asset_id -> r.mime).toMap ==
      again.map(r => r.asset_id -> r.mime).toMap)
  }

  test("decode: deterministic metadata; images single-frame, videos multi") {
    val d = Multimodal.decode(assets).collect()
    assert(d.length == 500)
    assert(d.forall(x => x.width >= 64 && x.height >= 64))
    assert(d.filter(_.mime == "image/png").forall(_.n_frames == 1))
    assert(d.filter(_.mime == "image/png").forall(_.duration_ms == 0))
    assert(d.filter(_.mime == "video/mp4").exists(_.n_frames > 1))
  }

  test("extractFeatures: unit-normalized, stable across batch sizes") {
    val f8 = Multimodal.extractFeatures(assets, dim = 16, batchSize = 8)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    val f64 = Multimodal.extractFeatures(assets, dim = 16, batchSize = 64)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(f8 == f64) // batch shape must not change results
    val norms = f8.values.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
  }

  test("sampleFrames: ≤n frames per asset, fan-out rows keyed by asset") {
    val frames = Multimodal.sampleFrames(assets, n = 4)
    val perAsset = frames.groupByKey(_.asset_id).count().collect().toMap
    assert(perAsset.values.max <= 4)
    assert(frames.collect().forall(_.frame.length == 8))
    // every asset yields at least one frame
    assert(perAsset.size == 500)
  }

  test("feature output joins back into relational/ANN pipeline") {
    val feats = Multimodal.extractFeatures(assets, dim = 16).toDF()
    val joined = feats.join(assets.toDF(), "asset_id")
    assert(joined.count() == 500)
    import graft.functions.GraftExpressions.cosine_sim
    val self = joined.select(cosine_sim(col("features"), col("features")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-6)
  }

  test("averageHash: aHash bit rule, and k cell flips move ≤ k bits") {
    // flat grid: nothing strictly above the mean → hash 0
    assert(Multimodal.averageHash(Array.fill(64)(10)) === 0L)
    // one bright pixel above an otherwise-flat grid → exactly that bit
    val g = Array.fill(64)(10); g(5) = 200
    assert(java.lang.Long.bitCount(Multimodal.averageHash(g)) === 1)
    // the banding soundness property: flipping k cells across the (stable)
    // mean changes ≤ k hash bits
    val base = Array.tabulate(64)(i => if (i < 32) 0 else 255)
    val tweaked = base.clone(); tweaked(0) = 255; tweaked(63) = 0
    val d = java.lang.Long.bitCount(
      Multimodal.averageHash(base) ^ Multimodal.averageHash(tweaked))
    assert(d <= 2, s"2 cell flips moved $d bits")
    intercept[IllegalArgumentException] { Multimodal.averageHash(Array(1, 2)) }
  }

  test("imageNearDups: byte-identical assets pair at hamming 0, deterministic") {
    // plant two byte-level duplicates among distinct payloads
    val planted = spark.createDataset(Seq(
      Asset(1L, "same-bytes".getBytes, "image/png"),
      Asset(2L, "same-bytes".getBytes, "image/png"),
      Asset(3L, "other".getBytes, "image/png"),
      Asset(4L, "another".getBytes, "image/png")))
    val pairs = Multimodal.imageNearDups(planted, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L && p._3 == 0))
    // corpus-scale run with planted byte-duplicates (the corpus itself has
    // no byte-identical texts): every plant pairs with its source at
    // hamming 0, and the run is reproducible end-to-end
    val planted2 = assets.filter(_.asset_id < 20)
      .map(a => a.copy(asset_id = a.asset_id + 10000000L))
    val corpus = assets.unionByName(planted2)
    val a = Multimodal.imageNearDups(corpus).collect().map(_.toSeq).toSet
    val b = Multimodal.imageNearDups(corpus).collect().map(_.toSeq).toSet
    assert(a == b)
    val zeroPairs = a.filter(_(2) == 0)
    assert((0L until 20L).forall(i =>
      zeroPairs.exists(p => p(0) == i && p(1) == i + 10000000L)))
  }

  // ── REAL image codec (VERDICT r10 #4: JDK-only javax.imageio) ───────────

  test("gray PNG roundtrip is pixel-exact through the real codec") {
    val pix = Array.tabulate(256)(i => i % 256)
    val bytes = ImageCodec.encodeGrayPng(pix, 16, 16)
    // real PNG magic, real parse
    assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'.toByte)
    val Some((w, h, luma)) = ImageCodec.decodeLuma(bytes)
    assert(w === 16 && h === 16)
    assert(luma.toSeq === pix.toSeq,
      "gray sample values must survive encode→decode exactly (raster " +
        "samples, not the gray→sRGB getRGB conversion)")
  }

  test("BMP decodes through the same path (second JDK container format)") {
    val pix = Array.tabulate(64)(i => (i * 4) % 256)
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, pix(y * 8 + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val Some((w, h, luma)) = ImageCodec.decodeLuma(bos.toByteArray)
    assert((w, h) === (8, 8))
    assert(luma.toSeq === pix.toSeq)
  }

  test("RGB PNG lands on integer BT.601 luma (fixture-pinned)") {
    // 2×1: pure red and a known mixed color
    val rgb = Array(0xff0000, 0x102030)
    val Some((w, h, luma)) = ImageCodec.decodeLuma(ImageCodec.encodeRgbPng(rgb, 2, 1))
    assert((w, h) === (2, 1))
    assert(luma(0) === (77 * 255) >> 8)                      // 76
    assert(luma(1) === (77 * 16 + 150 * 32 + 29 * 48) >> 8)  // 28
  }

  test("downsample is the integer block mean; grid8 on 16×16 is 2×2 averages") {
    val pix = Array.tabulate(256)(k => k % 251)
    val g = ImageCodec.grid8(pix, 16, 16)
    for (j <- 0 until 8; i <- 0 until 8) {
      val ks = Seq((2*j)*16 + 2*i, (2*j)*16 + 2*i + 1,
        (2*j+1)*16 + 2*i, (2*j+1)*16 + 2*i + 1)
      assert(g(j * 8 + i) === ks.map(pix).sum / 4)
    }
    // non-divisible shape still covers every pixel exactly once
    val odd = ImageCodec.downsample(Array.fill(15 * 9)(7), 15, 9, 8, 8)
    assert(odd.forall(_ === 7))
  }

  test("decode routes real images to real metadata; undecodable image bytes fall back to stub") {
    val realPng = Asset(1L, ImageCodec.encodeGrayPng(Array.fill(12 * 5)(9), 12, 5), "image/png")
    val fakePng = Asset(2L, "not an image".getBytes, "image/png")
    val audio = Asset(3L, "wav-ish".getBytes, "audio/wav")
    val d = Multimodal.decode(spark.createDataset(Seq(realPng, fakePng, audio)))
      .collect().map(x => x.asset_id -> x).toMap
    assert(d(1L).width === 12 && d(1L).height === 5 &&
      d(1L).n_frames === 1 && d(1L).duration_ms === 0L)
    assert(d(2L).width === StubCodecs.decode(fakePng).width, "stub fallback")
    assert(d(3L).width === StubCodecs.decode(audio).width)
  }

  test("real resize: area-mean over true pixels, re-encoded as decodable PNG") {
    val pix = Array.tabulate(256)(k => (3 * k) % 256)
    val a = Asset(7L, ImageCodec.encodeGrayPng(pix, 16, 16), "image/png")
    val resized = Multimodal.resizeOne(Multimodal.decodeOne(a), 8, 8)
    assert(resized.width === 8 && resized.height === 8)
    val Some((w, h, luma)) = ImageCodec.decodeLuma(resized.media)
    assert((w, h) === (8, 8))
    assert(luma.toSeq === ImageCodec.grid8(pix, 16, 16).toSeq)
  }

  test("realPngAssets: decoded pixels equal the closed-form raster; phash is real") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sample = Multimodal.realPngAssets(spark, docs.limit(10)).collect()
    sample.foreach { a =>
      val Some((w, h, luma)) = ImageCodec.decodeLuma(a.media)
      assert((w, h) === (16, 16))
      val want = Array.tabulate(256)(k => Multimodal.fixturePixel(a.asset_id, k))
      assert(luma.toSeq === want.toSeq, s"asset ${a.asset_id}")
      // phash64 over the REAL grid equals the arithmetic replay
      assert(Multimodal.phash64(a) ===
        Multimodal.averageHash(ImageCodec.grid8(want, 16, 16)))
    }
  }

  test("WAV PCM16 roundtrip is sample-exact through the real audio codec") {
    val pcm = Array.tabulate(300)(i => ((i * 123 - 15000) % 32768).toShort)
    val bytes = AudioCodec.encodeWavPcm16(pcm, 16000)
    // real RIFF/WAVE magic
    assert(new String(bytes.take(4)) === "RIFF" &&
      new String(bytes.slice(8, 12)) === "WAVE")
    val Some((rate, ch, back)) = AudioCodec.decodePcm16(bytes)
    assert(rate === 16000 && ch === 1)
    assert(back.toSeq === pcm.toSeq)
    // non-audio bytes refuse cleanly
    assert(AudioCodec.decodePcm16("not audio".getBytes).isEmpty)
  }

  test("audio decode routes real WAVs to real metadata; integer features are exact") {
    import spark.implicits._
    val pcm = Array[Short](100, -100, 200, -200, 0, 50)
    val real = Asset(1L, AudioCodec.encodeWavPcm16(pcm, 8000), "audio/wav")
    val fake = Asset(2L, "wav-ish".getBytes, "audio/wav")
    val d = Multimodal.decode(spark.createDataset(Seq(real, fake)))
      .collect().map(x => x.asset_id -> x).toMap
    assert(d(1L).width === 8000 && d(1L).height === 1) // (rate, channels)
    assert(d(1L).duration_ms === 6000L / 8000L)
    assert(d(2L).width === StubCodecs.decode(fake).width, "stub fallback")
    val sig = Multimodal.audioSignals(spark.createDataset(Seq(real, fake)))
      .collect()
    assert(sig.length === 1, "undecodable audio is dropped, not faked")
    assert(sig.head.energy ===
      pcm.map(s => s.toLong * s).sum)
    assert(sig.head.zero_crossings === 4) // +- ; -+ ; +- ; -0(+)... sign pairs
  }

  test("realWavAssets: decoded samples equal the closed form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sample = Multimodal.realWavAssets(spark, docs.limit(8)).collect()
    sample.foreach { a =>
      val Some((rate, ch, pcm)) = AudioCodec.decodePcm16(a.media)
      assert(rate === 8000 && ch === 1 && pcm.length === 256)
      val want = Array.tabulate(256)(k => Multimodal.fixtureSample(a.asset_id, k))
      assert(pcm.toSeq === want.toSeq, s"asset ${a.asset_id}")
    }
  }

  test("ISO-BMFF roundtrip: real box walk recovers metadata and exact frame slices") {
    val frames = Array(
      Array.tabulate(10)(_.toByte),
      Array.tabulate(25)(i => (i * 3).toByte),
      Array.tabulate(7)(i => (200 + i).toByte))
    val mp4 = IsoBmff.encodeMp4(frames, timescale = 1000, duration = 120L,
      width = 640, height = 360)
    // real container magic: ftyp box leads
    assert(new String(mp4.slice(4, 8)) === "ftyp")
    val Some(m) = IsoBmff.parse(mp4)
    assert(m.timescale === 1000L && m.duration === 120L)
    assert(m.width === 640 && m.height === 360)
    assert(m.nFrames === 3 && m.durationMs === 120L)
    assert(m.sampleSizes.toSeq === Seq(10, 25, 7))
    frames.indices.foreach { i =>
      assert(IsoBmff.sampleBytes(mp4, m, i).toSeq === frames(i).toSeq)
    }
    // non-container bytes refuse cleanly; truncation refuses cleanly
    assert(IsoBmff.parse("not a video".getBytes).isEmpty)
    assert(IsoBmff.parse(mp4.take(mp4.length / 2)).isEmpty)
  }

  test("hostile container/audio headers refuse instead of crashing the task") {
    // stsz sample_count = 0xFFFFFFFF: .toInt = -1 used to throw
    // NegativeArraySizeException past the parse's catch (r11 review)
    val mp4 = IsoBmff.encodeMp4(
      Array(Array.tabulate(10)(_.toByte)), 1000, 40, 320, 240)
    def find4cc(b: Array[Byte], cc: String): Int = {
      val pat = cc.getBytes("US-ASCII")
      b.indices.indexWhere(i => i + 4 <= b.length &&
        b(i) == pat(0) && b(i+1) == pat(1) && b(i+2) == pat(2) && b(i+3) == pat(3))
    }
    val szIdx = find4cc(mp4, "stsz")
    val evil = mp4.clone()
    // count field: 4cc + version/flags(4) + sample_size(4) → offset +12
    (0 until 4).foreach(j => evil(szIdx + 12 + j) = 0xff.toByte)
    assert(IsoBmff.parse(evil).isEmpty)
    // huge fixed sample_size (negative as Int) also refuses
    val evil2 = mp4.clone()
    evil2(szIdx + 8) = 0x80.toByte
    assert(IsoBmff.parse(evil2).isEmpty)
    // WAV fmt chunk declaring sample rate 0: decode refuses (it used to
    // divide-by-zero in decodeOne's duration math)
    val wav = AudioCodec.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    val evilWav = wav.clone()
    // standard RIFF: rate is little-endian at bytes 24-27
    (24 until 28).foreach(j => evilWav(j) = 0)
    assert(AudioCodec.decodePcm16(evilWav).isEmpty)
    // ...and the decode pipeline falls back to the stub, not a crash
    import spark.implicits._
    val d = Multimodal.decode(spark.createDataset(Seq(
      Asset(1L, evil, "video/mp4"), Asset(2L, evilWav, "audio/wav"))))
      .collect()
    assert(d.length === 2)
  }

  test("video decode routes real MP4s to real metadata; frame sampling slices real mdat") {
    import spark.implicits._
    val frames = Array.tabulate(6)(i => Array.fill(12 + i)(i.toByte))
    val real = Asset(1L, IsoBmff.encodeMp4(frames, 1000, 240, 320, 240),
      "video/mp4")
    val fake = Asset(2L, "mp4-ish".getBytes, "video/mp4")
    val d = Multimodal.decode(spark.createDataset(Seq(real, fake)))
      .collect().map(x => x.asset_id -> x).toMap
    assert(d(1L).width === 320 && d(1L).height === 240 &&
      d(1L).n_frames === 6 && d(1L).duration_ms === 240L)
    assert(d(2L).width === StubCodecs.decode(fake).width, "stub fallback")
    val sampled = Multimodal
      .sampleFrames(spark.createDataset(Seq(real)), n = 3).collect()
      .sortBy(_.frame_idx)
    // 6 frames, take 3, step 2 → indices 0, 2, 4; REAL payload slices
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    sampled.foreach(f =>
      assert(f.frame.toSeq === frames(f.frame_idx).toSeq))
  }

  test("realMp4Assets: parsed containers match the closed form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sample = Multimodal.realMp4Assets(spark, docs.limit(10)).collect()
    sample.foreach { a =>
      val id = a.asset_id
      val Some(m) = IsoBmff.parse(a.media)
      assert(m.nFrames === (2 + id % 7).toInt)
      assert(m.width === (320 + id % 16).toInt)
      assert(m.height === (240 + id % 9).toInt)
      assert(m.durationMs === m.nFrames * 40L)
      m.sampleSizes.zipWithIndex.foreach { case (len, i) =>
        assert(len === (8 + (id * 7 + i * 3) % 32).toInt)
      }
    }
  }

  test("noisyPngPlants land within the aHash flip bound of their sources") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = Multimodal.realPngAssets(spark, docs)
      .filter(_.asset_id < 40).collect().map(a => a.asset_id -> a).toMap
    val plants = Multimodal.noisyPngPlants(spark, docs, 20L, 40L, 20000000L)
      .collect()
    assert(plants.length === 20)
    plants.foreach { p =>
      val src = base(p.asset_id - 20000000L)
      val d = java.lang.Long.bitCount(
        Multimodal.phash64(p) ^ Multimodal.phash64(src))
      assert(d <= 2, s"plant ${p.asset_id}: $d bits from source")
    }
  }

  test("pixelFeatures: exact 16-bin luma histogram for real images, batch-shape invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val realAssets = Multimodal.realPngAssets(spark, docs.limit(50))
    val f4 = Multimodal.pixelFeatures(realAssets, batchSize = 4)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    val f64 = Multimodal.pixelFeatures(realAssets, batchSize = 64)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    assert(f4 == f64)
    f4.values.foreach { v =>
      assert(v.length === 16)
      assert(math.abs(v.map(_.toDouble).sum - 1.0) < 1e-9,
        "histogram fractions over 256 pixels sum to exactly 1")
      // every component is an exact multiple of 1/256
      v.foreach(x => assert((x * 256) == (x * 256).round.toFloat))
    }
  }
}
