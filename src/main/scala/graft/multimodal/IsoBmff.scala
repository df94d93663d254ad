package graft.multimodal

/** REAL ISO base-media (MP4) CONTAINER parsing, hand-written to the
  * public ISO/IEC 14496-12 box layout (r11): no JDK video support exists,
  * but the container is pure byte structure — `[size:4][type:4]` boxes,
  * `moov/mvhd` for timescale+duration, `trak/tkhd` for 16.16
  * fixed-point width/height, `stbl/stsz` for per-sample sizes and
  * `stbl/stco` for chunk offsets. Parsing it gives real video METADATA
  * and real frame-payload EXTRACTION (the `mdat` slices); only the
  * codec DECODE of those payload bytes remains stubbed (no H.264
  * decoder ships anywhere in a JRE).
  *
  * Scope (documented, checked): 32-bit box sizes, one video track, one
  * sample per chunk (stco entry per sample — what the fixture writer
  * emits and what per-frame-addressable intermediates use). Anything
  * else returns None — the caller's stub-fallback signal, same contract
  * as [[ImageCodec.decodeLuma]].
  */
object IsoBmff {

  /** Parsed container: (timescale, duration in timescale units,
    * width, height, per-sample byte sizes, absolute sample offsets).
    */
  case class Mp4Meta(timescale: Long, duration: Long, width: Int,
      height: Int, sampleSizes: Array[Int], sampleOffsets: Array[Long]) {
    def nFrames: Int = sampleSizes.length
    def durationMs: Long =
      if (timescale == 0) 0L else duration * 1000 / timescale
  }

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Children of the box span [from, to): returns (type, payloadStart,
    * payloadEnd) triples. Malformed sizes abort the walk (→ None above).
    */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var p = from
    while (p + 8 <= to) {
      val size = u32(b, p)
      if (size < 8 || p + size > to) return out.toSeq
      out += ((fourcc(b, p + 4), p + 8, p + size.toInt))
      p += size.toInt
    }
    out.toSeq
  }

  private def find(b: Array[Byte], from: Int, to: Int,
      name: String): Option[(Int, Int)] =
    boxes(b, from, to).collectFirst { case (`name`, s, e) => (s, e) }

  /** Parse an MP4; None when the bytes aren't a container this scope
    * covers (missing moov/trak/stbl, v1 64-bit times, multi-sample
    * chunks, truncation).
    */
  def parse(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      val top = boxes(bytes, 0, bytes.length)
      if (!top.exists(_._1 == "ftyp")) return None
      val (moovS, moovE) = top.collectFirst {
        case ("moov", s, e) => (s, e)
      }.getOrElse(return None)
      // mvhd v0: version/flags 4, creation 4, modification 4,
      // timescale 4, duration 4
      val (mvS, _) = find(bytes, moovS, moovE, "mvhd").getOrElse(return None)
      if (bytes(mvS) != 0) return None // v1 (64-bit times) out of scope
      val timescale = u32(bytes, mvS + 12)
      val duration = u32(bytes, mvS + 16)
      val (trakS, trakE) = find(bytes, moovS, moovE, "trak").getOrElse(return None)
      // tkhd v0: version/flags 4, creation 4, modification 4, track 4,
      // reserved 4, duration 4, reserved 8, layer 2, group 2, volume 2,
      // reserved 2, matrix 36, width 4 (16.16), height 4 (16.16)
      val (tkS, _) = find(bytes, trakS, trakE, "tkhd").getOrElse(return None)
      if (bytes(tkS) != 0) return None
      val width = (u32(bytes, tkS + 76) >> 16).toInt
      val height = (u32(bytes, tkS + 80) >> 16).toInt
      val (mdiaS, mdiaE) = find(bytes, trakS, trakE, "mdia").getOrElse(return None)
      val (minfS, minfE) = find(bytes, mdiaS, mdiaE, "minf").getOrElse(return None)
      val (stblS, stblE) = find(bytes, minfS, minfE, "stbl").getOrElse(return None)
      // stsz: version/flags 4, sample_size 4 (0 = per-sample table),
      // sample_count 4, then count × uint32. VALIDATE counts and sizes
      // BEFORE allocating (r11 adversarial review): a hostile
      // sample_count like 0xFFFFFFFF .toInt'd to -1 threw
      // NegativeArraySizeException past the IndexOutOfBounds catch and
      // killed the Spark task; a fixed sample_size >= 2^31 went negative
      // and slipped the bounds check only to crash sampleBytes later.
      val (szS, szE) = find(bytes, stblS, stblE, "stsz").getOrElse(return None)
      val fixedSize = u32(bytes, szS + 4)
      if (fixedSize > Int.MaxValue) return None
      val nL = u32(bytes, szS + 8) // u32 is unsigned: always >= 0
      // a per-sample table must physically fit inside its own box
      if (nL > bytes.length ||
        (fixedSize == 0 && szS + 12 + 4 * nL > szE)) return None
      val n = nL.toInt
      val sizes = Array.tabulate(n)(i =>
        if (fixedSize != 0) fixedSize.toInt
        else u32(bytes, szS + 12 + 4 * i).toInt)
      if (sizes.exists(_ < 0)) return None
      // stco: version/flags 4, entry_count 4, then count × uint32 —
      // one chunk per sample in this scope
      val (coS, coE) = find(bytes, stblS, stblE, "stco").getOrElse(return None)
      val nChunks = u32(bytes, coS + 4)
      if (nChunks != n) return None // multi-sample chunks out of scope
      if (coS + 8 + 4 * nChunks > coE) return None
      val offsets = Array.tabulate(n)(i => u32(bytes, coS + 8 + 4 * i))
      if (offsets.exists(_ > bytes.length) || // u32: never negative
        sizes.indices.exists(i => offsets(i) + sizes(i) > bytes.length))
        return None
      Some(Mp4Meta(timescale, duration, width, height, sizes, offsets))
    } catch { case _: IndexOutOfBoundsException => None }

  /** Extract sample (frame payload) `i` — the real mdat slice. */
  def sampleBytes(bytes: Array[Byte], meta: Mp4Meta, i: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, meta.sampleOffsets(i).toInt,
      meta.sampleOffsets(i).toInt + meta.sampleSizes(i))

  // ── Writer (fixtures + per-frame-addressable intermediates) ─────────────

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    val size = out.length
    out(0) = (size >> 24).toByte; out(1) = (size >> 16).toByte
    out(2) = (size >> 8).toByte; out(3) = size.toByte
    System.arraycopy(tpe.getBytes("US-ASCII"), 0, out, 4, 4)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** Minimal valid single-track MP4: ftyp, mdat (frames concatenated),
    * moov{mvhd, trak{tkhd, mdia{minf{stbl{stsz, stco}}}}} — one chunk
    * per sample, 32-bit everything, v0 boxes. The parser above reads a
    * real ffmpeg-style layout; this writer produces one, so encode →
    * parse exercises genuine container structure both ways.
    */
  def encodeMp4(frames: Array[Array[Byte]], timescale: Long, duration: Long,
      width: Int, height: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isomiso2".getBytes("US-ASCII"))
    val mdatPayload = frames.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    // absolute offsets of each frame inside the final file: ftyp, then
    // mdat header (8), then the running frame offset
    val mdatStart = ftyp.length + 8
    val offsets = frames.scanLeft(mdatStart.toLong)(_ + _.length).init
    // after rate: volume(2) + reserved(10) + matrix(36) + pre_defined(24)
    // + next_track_ID(4) = 76 bytes
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ be32(0x00010000L) ++
      Array.fill(76)(0.toByte))
    val matrix: Array[Byte] = (be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x40000000L))
    val tkhd = box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(duration) ++ Array.fill(16)(0.toByte) ++ matrix ++
      be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.length) ++
      frames.flatMap(f => be32(f.length.toLong)))
    val stco = box("stco", be32(0) ++ be32(frames.length) ++
      offsets.flatMap(be32))
    val stbl = box("stbl", stsz ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }
}
