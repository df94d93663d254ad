package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic sketch kernels shared by the interpreted `eval` path and the
  * generated (whole-stage codegen) path of the custom expressions in
  * [[GraftExpressions]]. Scala-object static forwarders make these callable
  * from generated Java code as `graft.functions.SketchOps.xxx(...)`.
  *
  * All constants are fixed so results are reproducible across runs and
  * cluster sizes (no RNG at execution time).
  */
object SketchOps {

  /** Mersenne prime 2^61-1: modulus for the universal hash family. */
  val Prime: Long = (1L << 61) - 1

  /** Deterministic (a, b) parameters for the k-th universal hash
    * `h_k(x) = (a_k * x + b_k) mod p`. SplitMix64 over the index gives
    * well-distributed, reproducible parameters.
    */
  def hashParamA(i: Int): Long = (splitmix64(2L * i + 1) % (Prime - 1)).abs + 1
  def hashParamB(i: Int): Long = splitmix64(2L * i + 2).abs % Prime

  /** Parameter tables per k, computed once per JVM — the minhash inner loop
    * must not recompute splitmix64 per (element × hash function).
    */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def params(k: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(k,
      _ => (Array.tabulate(k)(hashParamA), Array.tabulate(k)(hashParamB)))

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: k minima of universal hashes over the element set.
    * One pass over the array per row: O(n*k) multiplies, no allocation
    * beyond the signature.
    */
  def minhash(elements: ArrayData, k: Int): ArrayData = {
    val n = elements.numElements()
    val (pa, pb) = params(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      // reduce x into [0, Prime) FIRST so a*x < 2^61 * 2^61 = 2^122 and every
      // partial sum below provably fits in 63 bits (no silent wrap)
      var x = elements.getLong(i) & Long.MaxValue // non-negative
      x = (x & Prime) + (x >>> 61)
      if (x >= Prime) x -= Prime
      var j = 0
      while (j < k) {
        // (a*x+b) mod p; the 128-bit product is emulated via Math.multiplyHigh
        val a = pa(j)
        val b = pb(j)
        val hi = Math.multiplyHigh(a, x) // < 2^58 since a,x < 2^61
        val lo = a * x
        // fold 2^64*hi + lo mod (2^61-1): 2^64 ≡ 8 (mod p);
        // (lo&Prime) < 2^61, (lo>>>61) ≤ 7, hi*8 < 2^61, b < 2^61 → sum < 2^63
        var h = (lo & Prime) + ((lo >>> 61) + hi * 8) + b
        h = (h & Prime) + (h >>> 61)
        if (h >= Prime) h -= Prime
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Deflate compression ratio of a text's UTF-8 bytes (compressed/raw,
    * level 6) — the Gopher-family compressibility quality signal: highly
    * repetitive machine-generated text compresses far below prose, random
    * noise compresses above it. Deterministic for a fixed zlib (the JDK's
    * bundled one); the specs pin ordering properties, not magic constants,
    * so a JDK zlib bump cannot silently break the suite. Empty text → 1.0.
    */
  // per-thread Deflater + scratch buffer: a fresh native zlib stream per
  // row costs more than the compression itself on short documents
  // (review r9); reset() restores the exact initial state, so reuse
  // cannot change the output
  private val deflaterTL =
    ThreadLocal.withInitial[(java.util.zip.Deflater, Array[Byte])](() =>
      (new java.util.zip.Deflater(6), new Array[Byte](8192)))

  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val (d, buf) = deflaterTL.get()
    d.reset()
    d.setInput(bytes); d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** 64-bit SimHash over pre-hashed tokens: majority vote per bit. */
  def simhash(tokenHashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokenHashes.numElements()
    var i = 0
    while (i < n) {
      val h = tokenHashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Z-order (Morton) key: interleaves the low 31 bits of two
    * non-negative ints — a.bit(i) lands at position 2i, b.bit(i) at
    * 2i+1 — into a 62-bit key whose integer order is the space-filling
    * Z-curve over (a, b). Sorting a table by this key clusters rows that
    * are close in BOTH dimensions into the same parquet row groups, which
    * is what makes min/max zone maps prune multi-dimensional range
    * predicates (the Delta/Iceberg OPTIMIZE ZORDER layout trick —
    * clustering is the cheap half of data skipping; the scan-side pruning
    * is parquet's own row-group statistics, already pushed down by
    * Spark).
    *
    * Pure bit arithmetic: an external engine reproduces the key as an
    * unrolled sum of shifted bit extractions (the DuckDB oracle does
    * exactly that), so layouts planned here verify elsewhere. Inputs
    * outside [0, 2^31) raise — silently masking high bits would
    * interleave GARBAGE positions and destroy the locality the caller
    * asked for; rank/bucketize wider domains first.
    */
  def zorder2(a: Long, b: Long): Long = {
    require(a >= 0 && a < (1L << 31) && b >= 0 && b < (1L << 31),
      s"zorder2 inputs must be in [0, 2^31): got ($a, $b) — rank or " +
        "bucketize wider domains first (zorder2_bucketized auto-pmods, " +
        "with a documented wrap-locality caveat)")
    spread31(a) | (spread31(b) << 1)
  }

  /** Spreads the low 31 bits of x to even positions 0,2,4,…,60 via the
    * standard mask-shift doubling sequence (each step separates bit
    * groups; constants are the 64-bit Morton masks).
    */
  private def spread31(x0: Long): Long = {
    var x = x0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Cosine similarity of two DOUBLE vectors — same fixed-order
    * accumulation as [[cosineFloat]]; used where one side is a computed
    * centroid (k-means) rather than a stored float embedding. Matches
    * DuckDB's `list_cosine_similarity(x::DOUBLE[], y::DOUBLE[])`
    * bit-for-bit on the float-valued inputs the embedding gates feed it.
    */
  def cosineDouble(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"dim mismatch: $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Cosine similarity of two float vectors (double accumulation, fixed
    * left-to-right order → bit-deterministic).
    */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n, s"dim mismatch: $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** In-bucket near-dup pair scan: one tight loop over an LSH bucket's
    * members (array of struct(id, vec), SORTED by id) emitting only the
    * (id_a, id_b, cosine) triples at or above `threshold`. One kernel call
    * replaces a transform/filter/flatten lambda stack whose per-candidate
    * interpreted evaluation dominated the multi-table LSH verify (the
    * bucket's b²/2 candidates never exist as expression-tree values here,
    * only as loop iterations).
    */
  def bucketNearPairs(members: ArrayData, threshold: Double): ArrayData = {
    val n = members.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < n - 1) {
      val ri = members.getStruct(i, 2)
      val idA = ri.getLong(0)
      val va = ri.getArray(1)
      var j = i + 1
      while (j < n) {
        val rj = members.getStruct(j, 2)
        val cos = cosineFloat(va, rj.getArray(1))
        if (cos >= threshold)
          out += org.apache.spark.sql.catalyst.InternalRow(idA, rj.getLong(0), cos)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Dot product of a float vector with one of `planes`' rows (used by the
    * random-hyperplane LSH): returns the h sign bits packed into an int.
    */
  def projectionBits(vec: ArrayData, planes: Array[Array[Double]]): Int = {
    var bits = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      val n = math.min(vec.numElements(), plane.length)
      while (i < n) { dot += vec.getFloat(i) * plane(i); i += 1 }
      if (dot >= 0) bits |= (1 << p)
      p += 1
    }
    bits
  }

  /** Deterministic pseudo-random hyperplanes (unit-free gaussian-ish via
    * splitmix64 → [-1,1)) for [[projectionBits]]. Generated once per plan on
    * the driver; tiny (h × dim doubles).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { i =>
        val u = splitmix64(seed + p * 1315423911L + i)
        (u.toDouble / Long.MaxValue.toDouble) // in [-1, 1)
      }
    }

  // ── Int8 embedding quantization ─────────────────────────────────────────
  // Symmetric per-vector quantization: scale = max|v| / 127, code_i =
  // floor(v_i/scale + 0.5) ∈ [-127, 127]. 4× smaller embedding storage/IO
  // — at 100 TB the embedding columns dominate ANN scan cost, and the
  // compressed-domain scan (int8 dot products) is the standard first stage
  // before exact float refine (same shape as the PQ/ADC ladder). The
  // floor(x + 0.5) form (NOT round/rint) is deliberate: IEEE-double floor
  // and division agree bit-for-bit across engines, so the DuckDB oracle
  // replays the codes exactly — half-even rint or decimal-string rounding
  // would diverge on exact .5 quotients.

  /** Per-vector quantization scale (0.0 for an all-zero or empty vector). */
  def int8Scale(v: ArrayData): Double = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    m / 127.0
  }

  /** Int8 codes under [[int8Scale]]; all-zero vector → all-zero codes. */
  def int8Codes(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val s = int8Scale(v)
    val out = new Array[Byte](n)
    if (s > 0) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(v.getFloat(i).toDouble / s + 0.5).toByte
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Greedy longest-match WordPiece (Wu et al. 2016 — the BERT
    * tokenizer's wordpiece stage): for each whitespace word of
    * `lower(trim(text))`, repeatedly take the LONGEST vocab piece
    * prefixing the remainder (continuation pieces carry the `##` prefix);
    * a word with no full decomposition emits `[UNK]`, matching the
    * reference implementations. O(len · maxPieceLen) hash probes per word
    * — no trie needed at vocab sizes that broadcast as plan literals
    * (a 30k-entry vocab is ~1 MB, embedded once per plan, shared by all
    * tasks in the generated code's reference array).
    */
  def wordpieceTokens(text: UTF8String, vocab: java.util.HashSet[String],
      maxLen: Int): ArrayData = {
    val toks = WsPattern.split(text.trim().toLowerCase.toString, -1)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      if (w.nonEmpty) {
        val buf = new scala.collection.mutable.ArrayBuffer[String]
        var pos = 0
        var dead = false
        while (pos < w.length && !dead) {
          var len = math.min(maxLen, w.length - pos)
          var hit: String = null
          while (len > 0 && hit == null) {
            val cand =
              (if (pos > 0) "##" else "") + w.substring(pos, pos + len)
            if (vocab.contains(cand)) hit = cand
            len -= 1
          }
          if (hit == null) dead = true
          else {
            buf += hit
            pos += hit.length - (if (pos > 0) 2 else 0)
          }
        }
        if (dead) out += UTF8String.fromString("[UNK]")
        else buf.foreach(p => out += UTF8String.fromString(p))
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Exact integer dot product of two int8 code vectors — the
    * compressed-domain ANN scoring primitive. Per-vector scales cancel in
    * cosine (cos ≈ dot(a,b)/sqrt(dot(a,a)·dot(b,b))), so candidate ranking
    * needs ONLY these integer dots over the 4×-smaller codes.
    */
  def int8Dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n, s"dim mismatch: $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }

  /** Rolling polynomial hash fingerprint (winnowing-style document
    * fingerprint): min of the rolling hashes over `window`-grams of the
    * token-hash sequence. Returns 0 for documents shorter than the window.
    */
  def rollingMinFingerprint(tokenHashes: ArrayData, window: Int): Long = {
    val n = tokenHashes.numElements()
    if (n < window) return 0L
    val Base = 1099511628211L // FNV prime as polynomial base
    var basePow = 1L
    var i = 0
    while (i < window - 1) { basePow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = h * Base + tokenHashes.getLong(i); i += 1 }
    var min = h
    i = window
    while (i < n) {
      h = (h - tokenHashes.getLong(i - window) * basePow) * Base + tokenHashes.getLong(i)
      if (h < min) min = h
      i += 1
    }
    min
  }

  // ── HyperLogLog (dense, mergeable distinct sketch) ──────────────────────
  // The maintainable half of COUNT DISTINCT: retraction algebra cannot
  // maintain distincts (a delete might or might not remove the last copy),
  // but an ADD-ONLY feed maintains a per-group HLL by pure register max —
  // associative, commutative, idempotent, so replays and merges are free.
  // p=12 → 4096 one-byte registers per sketch, ~1.6% relative error.

  val HllP = 12
  val HllM: Int = 1 << HllP

  /** Format version, stored as the sketch's FIRST byte. Bumped whenever
    * the register hash changes (v2 = fnv64+fmix, r10; v1 was the
    * unversioned xxhash64 era): merging sketches from two hash spaces
    * register-max-wise would silently double-count the overlap, so
    * [[hllMerge]] refuses a version mismatch LOUDLY instead — persisted
    * pre-upgrade sketches must be rebuilt, not mixed (review r10).
    * Headerless legacy sketches (length 4096) fail the length check.
    */
  val HllVersion: Byte = 2

  def hllZero(): Array[Byte] = {
    val a = new Array[Byte](HllM + 1)
    a(0) = HllVersion
    a
  }

  private def checkHll(regs: Array[Byte]): Unit =
    require(regs.length == HllM + 1 && regs(0) == HllVersion,
      s"incompatible HLL sketch (len ${regs.length}, version " +
        s"${if (regs.nonEmpty) regs(0) else -1}; want ${HllM + 1}/" +
        s"$HllVersion): the register hash changed — rebuild stored " +
        "sketches, do not merge across hash spaces")

  /** Fold one 64-bit hash into the registers (mutates and returns). */
  def hllAdd(regs: Array[Byte], hash: Long): Array[Byte] = {
    checkHll(regs)
    val idx = (hash >>> (64 - HllP)).toInt + 1 // byte 0 is the version
    val rest = hash << HllP
    val rank =
      (if (rest == 0L) 64 - HllP else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
    regs
  }

  /** Register-wise max merge (mutates and returns `a`). Idempotent:
    * merging a sketch with itself — or replaying a batch — is a no-op.
    * Refuses version mismatches (see [[HllVersion]]).
    */
  def hllMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    checkHll(a); checkHll(b)
    var i = 1
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  /** Standard HLL estimator with the small-range linear-counting
    * correction; fixed double arithmetic in index order — deterministic.
    */
  def hllEstimate(regs: Array[Byte]): Double = {
    checkHll(regs)
    val m = (regs.length - 1).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var invSum = 0.0
    var zeros = 0
    var i = 1
    while (i < regs.length) {
      val r = regs(i) & 0xff
      invSum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / invSum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else e
  }

  // ── Product quantization (IVF-PQ's compression half) ────────────────────
  // Codes are m bytes per vector instead of 4·dim — at 25B embeddings
  // (100 TB corpus scale) that is ~200 GB of codes vs ~6.4 TB of floats,
  // the difference between an in-memory scan and a disk-bound one.
  // Everything is deterministic: sample-order-fixed init, fixed Lloyd
  // iteration count, ties to the smallest codeword index.

  /** Train per-subspace codebooks by plain Lloyd k-means on a driver-side
    * sample (PQ fits on samples by design; quality saturates fast).
    * Returns codebooks[m][ksub][dsub] with dsub = dim/m. Initial codewords
    * are the first `ksub` distinct sample subvectors in sample order —
    * callers pass a hash-ordered sample, making the fit deterministic
    * regardless of partitioning. Empty cells keep their previous center.
    */
  def pqTrain(sample: Array[Array[Float]], m: Int, ksub: Int,
      iters: Int = 8): Array[Array[Array[Float]]] = {
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val off = s * dsub
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + dsub))
      // init: first ksub distinct subvectors (sample order is caller-fixed)
      val init = scala.collection.mutable.ArrayBuffer[Array[Float]]()
      var i = 0
      while (i < subs.length && init.size < ksub) {
        if (!init.exists(java.util.Arrays.equals(_, subs(i)))) init += subs(i)
        i += 1
      }
      while (init.size < ksub) init += init(init.size % math.max(1, init.size))
      var centers = init.toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        subs.foreach { v =>
          val c = nearestSub(v, centers)
          counts(c) += 1
          var j = 0
          while (j < dsub) { sums(c)(j) += v(j); j += 1 }
        }
        centers = Array.tabulate(ksub) { c =>
          if (counts(c) == 0) centers(c)
          else Array.tabulate(dsub)(j => (sums(c)(j) / counts(c)).toFloat)
        }
        it += 1
      }
      centers
    }
  }

  /** Index of the L2-nearest codeword (ties → smallest index). */
  private def nearestSub(v: Array[Float], centers: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      var d = 0.0; var j = 0
      val cw = centers(c)
      while (j < v.length) {
        val x = v(j) - cw(j); d += x * x; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Encode a vector as m codeword indices (one byte each; ksub ≤ 256). */
  def pqEncode(vec: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val off = s * dsub
      val sub = new Array[Float](dsub)
      var j = 0
      while (j < dsub) { sub(j) = vec.getFloat(off + j); j += 1 }
      out(s) = nearestSub(sub, codebooks(s)).toByte
      s += 1
    }
    out
  }

  /** Asymmetric (ADC) cosine of a FULL query vector against a PQ code:
    * cosine(query, reconstruction). dot and reconstruction norm accumulate
    * per subspace in doubles, fixed order — deterministic. O(dim) per
    * candidate like a true dot product, but the candidate side is read
    * from m BYTES (the memory/IO win PQ exists for).
    */
  def pqAdcCosine(query: ArrayData, codes: Array[Byte],
      codebooks: Array[Array[Array[Float]]]): Double = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    var dot = 0.0; var nq = 0.0; var nr = 0.0
    var s = 0
    while (s < m) {
      val cw = codebooks(s)(codes(s) & 0xff)
      val off = s * dsub
      var j = 0
      while (j < dsub) {
        val q = query.getFloat(off + j).toDouble
        val r = cw(j).toDouble
        dot += q * r; nq += q * q; nr += r * r
        j += 1
      }
      s += 1
    }
    if (nq == 0.0 || nr == 0.0) 0.0 else dot / math.sqrt(nq * nr)
  }

  // ── Bloom filter over 64-bit hashes (deterministic double hashing) ──────
  // The prefilter behind Decontaminate.overlapBloom: ~bitsPerKey bits per
  // element instead of 64+ for an exact hash set, so an eval set too big to
  // broadcast exactly still broadcasts as a bloom. All parameters derive
  // deterministically from (n, bitsPerKey) — no RNG at execution time.

  /** Power-of-two bit count sized at ~bitsPerKey bits per element
    * (capped at 2^30 bits = 128 MB).
    */
  def bloomNumBits(n: Long, bitsPerKey: Int): Int = {
    val want = math.max(64L, n * bitsPerKey)
    var bits = 64
    while (bits < want && bits < (1 << 30)) bits <<= 1
    bits
  }

  /** Optimal hash-function count k ≈ bitsPerKey·ln2. */
  def bloomK(bitsPerKey: Int): Int =
    math.max(1, math.round(bitsPerKey * 0.6931472).toInt)

  /** Kirsch–Mitzenmacher double hashing: bit_i = (h1 + i·h2) & mask. */
  private def bloomSet(words: Array[Long], mask: Int, k: Int, h: Long): Unit = {
    var x = splitmix64(h)
    val h2 = splitmix64(h ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val bit = (x & mask).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      x += h2
      i += 1
    }
  }

  /** Add `hashes` into a partial bloom of `numBits` (power of two). */
  def bloomAdd(words: Array[Long], numBits: Int, k: Int,
      hashes: Iterator[Long]): Array[Long] = {
    val mask = numBits - 1
    hashes.foreach(h => bloomSet(words, mask, k, h))
    words
  }

  /** OR-merge two partial blooms (associative/commutative — safe as a
    * distributed aggregate combiner).
    */
  def bloomOr(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  /** Membership probe: false = definitely absent (the map-side drop),
    * true = possibly present (verified downstream by an exact join).
    */
  def bloomMightContain(words: Array[Long], k: Int, h: Long): Boolean = {
    val mask = (words.length << 6) - 1
    var x = splitmix64(h)
    val h2 = splitmix64(h ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val bit = (x & mask).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      x += h2
      i += 1
    }
    true
  }

  /** Little-endian WKB encoding of a 2-D point — the engine's carrier for
    * HANA ST_POINT values (§1.2: geometry maps to BinaryType/WKB).
    */
  def wkbPoint(x: Double, y: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte) // little-endian marker
    bb.putInt(1)     // geometry type 1 = Point
    bb.putDouble(x)
    bb.putDouble(y)
    bb.array()
  }

  /** Coordinate (0 = x, 1 = y) of a WKB point, honoring the byte-order
    * marker and the EWKB SRID/Z/M header variants; NaN for non-point
    * geometries.
    */
  def wkbPointCoord(wkb: Array[Byte], idx: Int): Double = {
    if (wkb == null || wkb.length < 21) return Double.NaN
    val order = if (wkb(0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    val bb = java.nio.ByteBuffer.wrap(wkb).order(order)
    val raw = bb.getInt(1)
    if ((raw & 0x0FFFFFFF) % 1000 != 1) return Double.NaN
    val off = if ((raw & EwkbSrid) != 0) 9 else 5
    if (wkb.length < off + 16) return Double.NaN
    bb.getDouble(off + idx * 8)
  }

  /** Little-endian WKB LineString from parallel coordinate arrays — takes
    * ST_GEOMETRY (§1.2) beyond the carrier: linework can be BUILT on the
    * engine, not just ferried (`S4HanaTableMapping.java:670` ships opaque
    * WKB; here the binary becomes constructible and introspectable).
    */
  def wkbLineString(xs: ArrayData, ys: ArrayData): Array[Byte] = {
    val n = math.min(xs.numElements(), ys.numElements())
    val bb = java.nio.ByteBuffer.allocate(9 + 16 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte) // little-endian marker
    bb.putInt(2)     // geometry type 2 = LineString
    bb.putInt(n)
    var i = 0
    while (i < n) {
      bb.putDouble(xs.getDouble(i)); bb.putDouble(ys.getDouble(i)); i += 1
    }
    bb.array()
  }

  // EWKB flag bits in the geometry-type word (PostGIS extended WKB; HANA
  // emits the SRID variant for ST_GEOMETRY columns with a spatial ref).
  private val EwkbZ = 0x80000000
  private val EwkbM = 0x40000000
  private val EwkbSrid = 0x20000000

  /** Recursive WKB coordinate walker: calls `f(x, y)` for every vertex of
    * the geometry starting at `off0` and returns the offset just past it.
    * Handles nested Multi* / GeometryCollection members (each with its OWN
    * byte-order marker, per spec), the EWKB SRID header, and Z/M
    * coordinates in both encodings (EWKB flag bits and ISO type+1000/2000/
    * 3000) — extra ordinates are skipped, the walk stays 2-D.
    * Throws on malformed input; public entry points map that to their
    * sentinel (-1 / NaN / UNKNOWN).
    */
  private def walkWkb(wkb: Array[Byte], off0: Int)(f: (Double, Double) => Unit): Int = {
    val order = if (wkb(off0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    val bb = java.nio.ByteBuffer.wrap(wkb).order(order)
    val raw = bb.getInt(off0 + 1)
    var off = off0 + 5
    if ((raw & EwkbSrid) != 0) off += 4 // skip the EWKB SRID word
    val isoCode = raw & 0x0FFFFFFF
    val dims = 2 + (if ((raw & EwkbZ) != 0 || isoCode / 1000 == 1 || isoCode / 1000 == 3) 1 else 0) +
      (if ((raw & EwkbM) != 0 || isoCode / 1000 >= 2) 1 else 0)
    val stride = 8 * dims
    def scan(k: Int): Unit = {
      var i = 0
      while (i < k) {
        f(bb.getDouble(off), bb.getDouble(off + 8)); off += stride; i += 1
      }
    }
    isoCode % 1000 match {
      case 1 => scan(1)
      case 2 => val n = bb.getInt(off); off += 4; scan(n)
      case 3 =>
        val rings = bb.getInt(off); off += 4
        var r = 0
        while (r < rings) { val k = bb.getInt(off); off += 4; scan(k); r += 1 }
      case 4 | 5 | 6 | 7 =>
        val n = bb.getInt(off); off += 4
        var i = 0
        while (i < n) { off = walkWkb(wkb, off)(f); i += 1 }
      case _ => throw new IllegalArgumentException(s"WKB type $raw")
    }
    off
  }

  /** WKB geometry-type name (POINT / LINESTRING / POLYGON / MULTI* /
    * GEOMETRYCOLLECTION), honoring the byte-order marker; UNKNOWN for
    * anything unparsable. Z/M/SRID variants (ISO type+1000s and EWKB flag
    * bits) resolve to their base type.
    */
  def wkbGeomType(wkb: Array[Byte]): String = {
    if (wkb == null || wkb.length < 5) return "UNKNOWN"
    val order = if (wkb(0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    (java.nio.ByteBuffer.wrap(wkb).order(order).getInt(1) & 0x0FFFFFFF) % 1000 match {
      case 1 => "POINT"
      case 2 => "LINESTRING"
      case 3 => "POLYGON"
      case 4 => "MULTIPOINT"
      case 5 => "MULTILINESTRING"
      case 6 => "MULTIPOLYGON"
      case 7 => "GEOMETRYCOLLECTION"
      case _ => "UNKNOWN"
    }
  }

  /** Vertex count of any supported WKB geometry (polygons sum their rings,
    * collections sum their members); -1 for malformed input.
    */
  def wkbNumPoints(wkb: Array[Byte]): Int = {
    if (wkb == null || wkb.length < 5) return -1
    var total = 0
    try { walkWkb(wkb, 0)((_, _) => total += 1); total }
    catch { case _: RuntimeException => -1 }
  }

  /** Envelope coordinate of any supported WKB geometry:
    * which = 0 → xmin, 1 → ymin, 2 → xmax, 3 → ymax; NaN when malformed.
    */
  def wkbExtent(wkb: Array[Byte], which: Int): Double = {
    if (wkb == null || wkb.length < 5) return Double.NaN
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    var count = 0
    try walkWkb(wkb, 0) { (x, y) =>
      if (x < xmin) xmin = x; if (x > xmax) xmax = x
      if (y < ymin) ymin = y; if (y > ymax) ymax = y
      count += 1
    } catch { case _: RuntimeException => return Double.NaN }
    if (count == 0) return Double.NaN
    which match {
      case 0 => xmin
      case 1 => ymin
      case 2 => xmax
      case 3 => ymax
      case _ => Double.NaN
    }
  }

  /** SRID of a WKB value: the EWKB SRID word when the flag is set, else 0
    * ("no spatial reference") — HANA's ST_SRID contract for unqualified
    * geometries.
    */
  def wkbSrid(wkb: Array[Byte]): Int = {
    if (wkb == null || wkb.length < 9) return 0
    val order = if (wkb(0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    val bb = java.nio.ByteBuffer.wrap(wkb).order(order)
    if ((bb.getInt(1) & EwkbSrid) != 0) bb.getInt(5) else 0
  }

  /** Stamp an SRID onto a WKB value (EWKB encoding: SRID flag bit + SRID
    * word after the type), replacing any existing one. Preserves the
    * value's byte order; only the top-level header changes, the body is
    * carried verbatim — so this is cheap and lossless on any geometry the
    * walker understands or not.
    */
  def wkbSetSrid(wkb: Array[Byte], srid: Int): Array[Byte] = {
    if (wkb == null || wkb.length < 5) return wkb
    val order = if (wkb(0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    val bb = java.nio.ByteBuffer.wrap(wkb).order(order)
    val raw = bb.getInt(1)
    val hadSrid = (raw & EwkbSrid) != 0
    val bodyOff = if (hadSrid) 9 else 5
    val out = java.nio.ByteBuffer.allocate(9 + wkb.length - bodyOff).order(order)
    out.put(wkb(0))
    out.putInt(raw | EwkbSrid)
    out.putInt(srid)
    out.put(wkb, bodyOff, wkb.length - bodyOff)
    out.array()
  }

  /** Collect an array of WKB geometries into one collection value:
    * homogeneous point/linestring/polygon members yield MULTIPOINT /
    * MULTILINESTRING / MULTIPOLYGON, anything mixed yields
    * GEOMETRYCOLLECTION (ST_GEOMETRY's Multi* surface,
    * `S4HanaTableMapping.java:670` ferries these opaquely; here they are
    * constructible). Members are embedded as full WKB values with their
    * own byte-order markers, per spec; NULL and provably-corrupt members
    * are skipped (see `keep` below), unknown-type members pass through
    * verbatim.
    */
  def wkbCollect(geoms: ArrayData): Array[Byte] = {
    val n = geoms.numElements()
    // NULL members are skipped (PostGIS ST_Collect semantics), and so is a
    // member that is PROVABLY corrupt: of a type the walker knows (1..7)
    // but truncated or padded — members parse sequentially by offset
    // downstream, so embedding one would corrupt every member after it.
    // A member of a type the walker does NOT know (CircularString etc.,
    // ferried opaquely per S4HanaTableMapping.java:670) is embedded
    // verbatim: it may be perfectly valid, and downstream introspection
    // degrading to sentinels on the whole value is visible, whereas
    // silently dropping real data is not.
    def keep(g: Array[Byte]): Boolean = {
      if (g == null || g.length < 5) return false
      val order = if (g(0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN
      val base = (java.nio.ByteBuffer.wrap(g).order(order).getInt(1)
        & 0x0FFFFFFF) % 1000
      if (base < 1 || base > 7) return true // unknown type: embed verbatim
      try walkWkb(g, 0)((_, _) => ()) == g.length
      catch { case _: RuntimeException => false }
    }
    val members = (0 until n).iterator
      .filterNot(geoms.isNullAt)
      .map(geoms.getBinary)
      .filter(keep)
      .toArray
    var size = 0
    var kind = -1 // common base type so far; -2 = mixed
    var i = 0
    while (i < members.length) {
      val g = members(i)
      size += g.length
      val order = if (g(0) == 1.toByte) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN
      val base = (java.nio.ByteBuffer.wrap(g).order(order).getInt(1) & 0x0FFFFFFF) % 1000
      kind = if (i == 0) base else if (kind == base) kind else -2
      i += 1
    }
    val collType = kind match {
      case 1 => 4 // MultiPoint
      case 2 => 5 // MultiLineString
      case 3 => 6 // MultiPolygon
      case _ => 7 // GeometryCollection (mixed, nested multis, or empty)
    }
    val bb = java.nio.ByteBuffer.allocate(9 + size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte)
    bb.putInt(collType)
    bb.putInt(members.length)
    members.foreach(bb.put)
    bb.array()
  }

  /** Euclidean distance between two WKB points (HANA ST_Distance on the
    * planar SRS); honors byte order and EWKB SRID headers via
    * [[wkbPointCoord]]. NaN when either side is not a point.
    */
  def wkbPointDistance(a: Array[Byte], b: Array[Byte]): Double = {
    val ax = wkbPointCoord(a, 0); val ay = wkbPointCoord(a, 1)
    val bx = wkbPointCoord(b, 0); val by = wkbPointCoord(b, 1)
    math.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))
  }

  /** HANA ALPHANUM padding: digit-only strings zero-pad to `len`, everything
    * else passes through (reference workload `VBAK_change.sql:1`).
    */
  def alphanumPad(s: UTF8String, len: Int): UTF8String = {
    val str = s.toString
    var allDigits = str.nonEmpty
    var i = 0
    while (allDigits && i < str.length) {
      if (!Character.isDigit(str.charAt(i))) allDigits = false
      i += 1
    }
    if (allDigits && str.length <= len)
      UTF8String.fromString(("0" * (len - str.length)) + str)
    else s
  }

  /** GPT-2 `bytes_to_unicode` (Radford et al. 2019, encoder.py — public):
    * every byte maps to a VISIBLE BMP character so byte sequences can
    * ride through string machinery that splits on whitespace and
    * compares lexicographically. Printable bytes map to themselves; the
    * control/whitespace/latin-1 gaps map to 256+n in ascending byte
    * order. The published algorithm is a loop; this is its closed form
    * (the gap runs are 0–32 → 256–288, 127–160 → 289–322, 173 → 323),
    * proven equal entry-by-entry in `ByteLevelSpec` — and the same
    * arithmetic is what the DuckDB oracles replay.
    */
  def byteVisible(b: Int): Int =
    if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
      (b >= 174 && b <= 255)) b
    else if (b <= 32) 256 + b
    else if (b <= 160) 289 + (b - 127)
    else 323 // b == 173

  private val visibleByte: Array[Int] = {
    val m = Array.fill(324)(-1)
    var b = 0
    while (b < 256) { m(byteVisible(b)) = b; b += 1 }
    m
  }

  /** Text → its UTF-8 bytes as byte-visible characters (the GPT-2
    * byte-level alphabet): arbitrary Unicode — CJK, emoji, non-BMP,
    * broken surrogates-as-bytes — becomes a string over 256 known
    * characters, so a tokenizer whose vocabulary includes all 256
    * single-byte pieces can NEVER hit an uncovered input. One pass over
    * the raw UTF-8 bytes; every mapped char is BMP and non-whitespace.
    */
  def byteEncode(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteVisible(bytes(i) & 0xff).toChar)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Inverse of [[byteEncode]] — fails loudly on a char outside the
    * byte-visible alphabet (the input wasn't an encode output).
    */
  def byteDecode(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.charAt(i).toInt
      val b = if (cp < visibleByte.length) visibleByte(cp) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"byte_decode: U+${cp.toHexString} is not a byte-visible char")
      out(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** UTF8String character n-grams → FNV-hashed longs, distinct and SORTED
    * (sortedness lets [[jaccardSorted]] merge-count in O(n+m)). Kernel for
    * the shingle stage of MinHash dedup.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // windows and folds run over CODE POINTS, matching the SQL oracle's
    // substr(text, i, n) character semantics: the old UTF-16-unit loop
    // silently shifted every window near a non-BMP char (an emoji split
    // into surrogate halves), so Spark's shingle set disagreed with any
    // code-point engine on astral text (same defect class as the r17
    // compiled-BPE symbolization fix). BMP text hashes identically either
    // way (charAt value == code point), so every existing gate is
    // unchanged.
    val cps = new Array[Int](s.length) // unit count is an upper bound
    var m = 0
    var idx = 0
    while (idx < s.length) { // hand-rolled scan: this is the dedup hot path
      val cp = s.codePointAt(idx)
      cps(m) = cp
      m += 1
      idx += Character.charCount(cp)
    }
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val buf = new Array[Long](m - n + 1)
    var i = 0
    while (i + n <= m) {
      var h = 0xcbf29ce484222325L // FNV-1a 64 over the n code points
      var j = i
      while (j < i + n) { h ^= cps(j); h *= 1099511628211L; j += 1 }
      buf(i) = h
      i += 1
    }
    sortedDistinct(buf)
  }

  /** Whitespace-token word n-grams → FNV-hashed longs, distinct and SORTED
    * (the hash equals FNV-1a over the n words joined by single spaces, so
    * it is tokenization-normalized: runs of whitespace collapse). The
    * word-level counterpart of [[shingleHashes]] — word n-grams have a far
    * larger vocabulary than character n-grams, which keeps prefix-filter
    * buckets small on repetitive corpora.
    */
  def wordNgramHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val buf = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      var h = 0xcbf29ce484222325L // FNV-1a 64
      var j = i
      while (j < i + n) {
        if (j > i) { h ^= ' '.toInt; h *= 1099511628211L }
        val w = toks(j)
        var k = 0
        while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
        j += 1
      }
      buf(i) = h
      i += 1
    }
    sortedDistinct(buf)
  }

  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  /** Per-token FNV-1a/64 hashes over the document's whitespace tokens —
    * the ORACLE-REPRODUCIBLE token hash feeding SimHash and the rolling
    * fingerprint. Tokenization reproduces `split(lower(trim(text)), "\s+")`
    * (same contract as [[topNgramFractions]]); each token hashes by FNV-1a
    * over its Unicode CODE POINTS (not UTF-16 units), because the DuckDB
    * oracle iterates characters with `unicode(...)` — and the wrap-around
    * int64 arithmetic replays exactly in any engine with 128-bit integers
    * (`(xor(h, cp) * prime) % 2^64`). Replaces the r8 xxhash64 path, which
    * no external engine could reproduce and therefore kept the
    * fingerprint/simhash gates rows-only.
    */
  /** Whole-string FNV-1a/64 over Unicode CODE POINTS (no trim/lowercase —
    * the value hashes as-is), finished with the murmur3 fmix64 avalanche:
    * raw FNV mixes into the LOW bits and its HIGH bits stay nearly
    * constant for short inputs (a 4-digit id barely moves them) — and the
    * HLL register index is exactly the top 12 bits, so without the
    * finisher every short key landed in a handful of registers and the
    * estimate collapsed (caught by the error-envelope spec: est 2.0 for 15
    * distinct). fmix64 is XOR-shifts and wrap-around multiplies — an
    * external engine replays every step (`xor(h, h >> 33)`, HUGEINT
    * multiply mod 2^64), which is the whole point of this hash: HLL
    * registers (and anything else keyed on a value hash) verify
    * off-cluster, where Spark-internal xxhash64 could not.
    */
  def fnv64(text: UTF8String): Long = {
    val s = text.toString
    var h = 0xcbf29ce484222325L
    var k = 0
    while (k < s.length) {
      val cp = s.codePointAt(k)
      h ^= cp
      h *= 1099511628211L
      k += Character.charCount(cp)
    }
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def fnvTokenHashes(text: UTF8String): ArrayData = {
    val s = text.trim().toLowerCase.toString
    val toks = WsPattern.split(s, -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      var h = 0xcbf29ce484222325L
      val w = toks(i)
      var k = 0
      while (k < w.length) {
        val cp = w.codePointAt(k)
        h ^= cp
        h *= 1099511628211L
        k += Character.charCount(cp)
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Unicode NFC normalization — canonical composition, the pre-pass that
    * makes byte-level exact dedup see é (U+00E9) and e+combining-acute
    * (U+0065 U+0301) as the SAME document. Exposed as its own kernel
    * (rather than folded into the case/punct normalizer) because NFC is a
    * visible-text-preserving transform a pipeline may want alone, and
    * because an external engine replays it directly (DuckDB
    * `nfc_normalize`) — both engines implement the one Unicode-specified
    * canonical composition, so the gate hash-matches. Fast path: NFC
    * quick-check avoids allocating for already-normalized text (ASCII and
    * most real corpora).
    */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Hashed bag-of-words linear classifier score — the fastText-style
    * learned quality filter (Joulin et al. 2016; the CCNet/LLaMA-pipeline
    * "page quality" classifier shape): each token hashes (same FNV fold
    * and tokenization contract as [[fnvTokenHashes]]) into one of
    * `weights.length` buckets, the token's integer milli-weight
    * accumulates EXACTLY (int64 sum — immune to fold order), and the
    * score is that sum over 1000·n_tokens. The linear layer only: apply
    * sigmoid/threshold downstream if needed — exp() is libm-dependent and
    * would break cross-engine hash gates, while this quotient is one IEEE
    * division of two exactly-computed integers. Map-side, O(text) per
    * row, weights ride the plan once.
    *
    * For power-of-two bucket counts the signed-pmod bucket equals the
    * unsigned `hash % d` an external engine computes on UBIGINT (d | 2^64)
    * — which is what keeps the oracle replayable.
    */
  def hashedBowScore(text: UTF8String, weights: Array[Int]): Double = {
    val s = text.trim().toLowerCase.toString
    val toks = WsPattern.split(s, -1)
    val d = weights.length
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      var h = 0xcbf29ce484222325L
      val w = toks(i)
      var k = 0
      while (k < w.length) {
        val cp = w.codePointAt(k)
        h ^= cp
        h *= 1099511628211L
        k += Character.charCount(cp)
      }
      val b = ((h % d) + d) % d
      sum += weights(b.toInt)
      i += 1
    }
    if (toks.length == 0) 0.0
    else sum.toDouble / (1000.0 * toks.length)
  }

  /** Fraction of tokens covered by the single most frequent word n-gram,
    * for EVERY n in `ns`, over one shared tokenization (Gopher's
    * `top_n_gram_fraction`, Rae et al. 2021 §A1.1 — boilerplate detector).
    * Tokenization reproduces `split(lower(trim(text)), "\s+")` exactly
    * (ASCII-space trim, Unicode lowercase, Java-regex split keeping empty
    * tokens), so the DuckDB oracle written against the higher-order-
    * function predecessor still holds. Each token is FNV-hashed once;
    * gram hashes fold the n token hashes, and the mode is the max run over
    * the sorted gram-hash array — O(L·|ns| + L log L) per document with a
    * codegen'd constant, replacing the interpreted Catalyst-lambda fold
    * that made the repetition metrics the slowest batch query (the
    * fraction is exact modulo 64-bit hash collisions).
    */
  def topNgramFractions(text: UTF8String, ns: Array[Int]): ArrayData = {
    val s = text.trim().toLowerCase.toString
    val toks = WsPattern.split(s, -1)
    val cnt = toks.length
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 0xcbf29ce484222325L // FNV-1a 64 over the token's chars
      val w = toks(i)
      var k = 0
      while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
      th(i) = h
      i += 1
    }
    val out = new Array[Double](ns.length)
    var t = 0
    while (t < ns.length) {
      val n = ns(t)
      if (cnt < n) out(t) = 0.0
      else {
        val m = cnt - n + 1
        val buf = new Array[Long](m)
        i = 0
        while (i < m) {
          var h = 0xcbf29ce484222325L // FNV-1a over the n token hashes' bytes
          var j = i
          while (j < i + n) {
            var x = th(j)
            var b = 0
            while (b < 8) { h ^= (x & 0xffL); h *= 1099511628211L; x >>>= 8; b += 1 }
            j += 1
          }
          buf(i) = h
          i += 1
        }
        java.util.Arrays.sort(buf)
        var best = 1; var run = 1
        i = 1
        while (i < m) {
          if (buf(i) == buf(i - 1)) { run += 1; if (run > best) best = run }
          else run = 1
          i += 1
        }
        // overlapping self-repeats ("a a a a", n=2) would credit shared
        // tokens twice and push the "fraction" past 1 — clamp, matching the
        // HOF predecessor and the oracle's least(1.0, ...)
        out(t) = math.min(1.0, best.toDouble * n / cnt)
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Positional FNV-hashed word n-grams — one hash per start position, IN
    * ORDER, duplicates kept (index i = the gram over tokens [i, i+n)).
    * The positional companion of [[wordNgramHashes]] (which sorts and
    * dedups for Jaccard): duplicated-SPAN detection needs to know where
    * each gram occurs, not just which grams exist. Tokenization reproduces
    * `split(lower(trim(text)), "\s+")` exactly (ASCII-space trim, Unicode
    * lowercase, Java-regex split keeping empty tokens), so a SQL engine
    * selecting grams by STRING equality over that tokenization selects the
    * same positions, modulo 64-bit hash collisions. Token hashes fold once
    * and gram hashes fold the n token hashes — O(chars + n·positions).
    */
  def wordNgramHashSeq(text: UTF8String, n: Int): ArrayData = {
    val toks = WsPattern.split(text.trim().toLowerCase.toString, -1)
    val cnt = toks.length
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 0xcbf29ce484222325L // FNV-1a 64 over the token's chars
      val w = toks(i)
      var k = 0
      while (k < w.length) { h ^= w.charAt(k); h *= 1099511628211L; k += 1 }
      th(i) = h
      i += 1
    }
    val m = cnt - n + 1
    val buf = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L // FNV-1a over the n token hashes' bytes
      var j = i
      while (j < i + n) {
        var x = th(j)
        var b = 0
        while (b < 8) { h ^= (x & 0xffL); h *= 1099511628211L; x >>>= 8; b += 1 }
        j += 1
      }
      buf(i) = h
      i += 1
    }
    new GenericArrayData(buf)
  }

  /** Drop the tokens covered by [starts(i), ends(i)) token spans and
    * re-join the survivors with single spaces. Spans must be sorted by
    * start and disjoint — the shape
    * [[graft.operators.Dedup.duplicatedSpans]] emits. Token TEXT (case,
    * punctuation) is preserved; only inter-token whitespace normalizes to
    * one space — the same normalization the tokenization that produced
    * the span indices applied. One forward pass, O(chars + spans).
    */
  def removeSpans(text: UTF8String, starts: ArrayData, ends: ArrayData): UTF8String = {
    val toks = WsPattern.split(text.trim().toString, -1)
    val ns = starts.numElements()
    val sb = new java.lang.StringBuilder(text.numBytes())
    var si = 0
    var first = true
    var j = 0
    while (j < toks.length) {
      while (si < ns && ends.getLong(si) <= j) si += 1
      val covered = si < ns && starts.getLong(si) <= j && j < ends.getLong(si)
      if (!covered) {
        if (!first) sb.append(' ')
        sb.append(toks(j))
        first = false
      }
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Sort + in-place dedupe, shared by the shingle kernels. */
  private def sortedDistinct(buf: Array[Long]): ArrayData = {
    java.util.Arrays.sort(buf)
    var w = 0
    var i = 0
    while (i < buf.length) {
      if (w == 0 || buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, w))
  }

  /** Exact Jaccard similarity of two SORTED distinct long arrays via a
    * single merge pass — no per-row hash-set allocation.
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }
}
