package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the sketch kernels (pure JVM — no Spark session). */
class SketchOpsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  private def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)

  test("jaccardSorted equals the naive set computation") {
    val gen = Gen.listOf(Gen.chooseNum(-1000L, 1000L))
    check(Prop.forAll(gen, gen) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val naive =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.toSet.intersect(sb.toSet).size.toDouble / sa.toSet.union(sb.toSet).size
      SketchOps.jaccardSorted(arr(sa), arr(sb)) == naive
    })
  }

  test("wordNgramHashes: whitespace-normalized, distinct, sorted") {
    import org.apache.spark.unsafe.types.UTF8String
    def grams(s: String) = SketchOps.wordNgramHashes(UTF8String.fromString(s), 3)
      .toLongArray().toSeq
    val a = grams("the quick brown fox jumps")
    assert(a.length == 3) // 5 words → 3 trigrams
    assert(a == a.sorted && a.distinct == a)
    // whitespace runs and padding don't change the grams
    assert(grams("  the\tquick  brown fox   jumps ") == a)
    // fewer words than n → empty
    assert(grams("one two").isEmpty)
  }

  test("minhash signature agreement estimates jaccard (statistical)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val base = Seq.fill(400)(rng.nextLong()).distinct
      val keep = base.filter(_ => rng.nextDouble() < 0.7)
      val extra = Seq.fill(100)(rng.nextLong()).distinct
      val other = (keep ++ extra).distinct
      val trueJ = base.toSet.intersect(other.toSet).size.toDouble /
        base.toSet.union(other.toSet).size
      val k = 256
      val s1 = SketchOps.minhash(arr(base), k)
      val s2 = SketchOps.minhash(arr(other), k)
      val agree = (0 until k).count(i => s1.getLong(i) == s2.getLong(i)).toDouble / k
      assert(math.abs(agree - trueJ) < 0.12, s"est=$agree true=$trueJ")
    }
  }

  test("alphanumPad: pads to length, idempotent, non-digits untouched") {
    check(Prop.forAll(Gen.chooseNum(0L, 999999999L)) { n =>
      val out = SketchOps.alphanumPad(UTF8String.fromString(n.toString), 10).toString
      out.length == 10 && out.toLong == n &&
        SketchOps.alphanumPad(UTF8String.fromString(out), 10).toString == out
    })
    check(Prop.forAll(Gen.alphaStr.suchThat(s => s.exists(!_.isDigit))) { s =>
      SketchOps.alphanumPad(UTF8String.fromString(s), 10).toString == s
    })
  }

  test("simhash of identical input equal; hamming bounded by 64") {
    check(Prop.forAll(Gen.listOf(Gen.long)) { xs =>
      val h1 = SketchOps.simhash(arr(xs))
      val h2 = SketchOps.simhash(arr(xs))
      h1 == h2 && java.lang.Long.bitCount(h1 ^ ~h1) == 64
    })
  }

  test("shingleHashes: sorted, distinct, count bounded by length") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val out = SketchOps.shingleHashes(UTF8String.fromString(s), 3)
      val xs = (0 until out.numElements()).map(out.getLong)
      xs == xs.sorted && xs.distinct == xs &&
        xs.length <= math.max(0, s.length - 2)
    })
  }

  test("shingleHashes windows run over code points, not UTF-16 units (r17)") {
    // "a😀bc" = 4 code points (5 UTF-16 units): exactly 3 bigram windows
    // [a😀][😀b][bc], matching SQL substr(text, i, 2) semantics — the
    // unit-based loop produced 4 windows, two of them surrogate halves
    def hashes(s: String, n: Int): Set[Long] = {
      val out = SketchOps.shingleHashes(UTF8String.fromString(s), n)
      (0 until out.numElements()).map(out.getLong).toSet
    }
    def ref(s: String, n: Int): Set[Long] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - n).map { i =>
        var h = 0xcbf29ce484222325L
        (i until i + n).foreach { j => h ^= cps(j); h *= 1099511628211L }
        h
      }.toSet
    }
    assert(hashes("a😀bc", 2).size === 3)
    assert(hashes("a😀bc", 2) === ref("a😀bc", 2))
    // BMP text is bit-identical to the historical unit-based fold
    // (charAt value == code point), so every existing gate is unchanged
    assert(hashes("hello", 3) === ref("hello", 3))
  }

  test("fnvTokenHashes equals a per-token big-integer FNV reference (property)") {
    // the reference folds over CODE POINTS with BigInt arithmetic, so any
    // wrap/overflow shortcut in the kernel that diverges from true
    // mod-2^64 semantics (what the DuckDB oracle computes) fails here.
    // Unicode strings included: surrogate pairs must fold as ONE codepoint.
    def refHash(tok: String): Long = {
      var h = BigInt("cbf29ce484222325", 16)
      val m = BigInt(1) << 64
      var k = 0
      while (k < tok.length) {
        val cp = tok.codePointAt(k)
        h = ((h ^ BigInt(cp)) * BigInt(1099511628211L)).mod(m)
        k += Character.charCount(cp)
      }
      h.longValue
    }
    val token = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.nonEmptyListOf(Gen.oneOf("ä", "ß", "中", "🦀", "q", "7"))
        .map(_.mkString)) // includes the non-BMP crab as a surrogate pair
    val gen = Gen.listOf(token).map(_.mkString(" "))
    check(Prop.forAll(gen) { s =>
      val out = SketchOps.fnvTokenHashes(UTF8String.fromString(s))
      val toks = s.trim.toLowerCase.split("\\s+", -1)
      val expect = toks.map(refHash).toSeq
      (0 until out.numElements()).map(out.getLong) == expect
    })
  }

  test("int8 codes: bounded, exact floor arithmetic vs double reference (property)") {
    val vec = Gen.nonEmptyListOf(Gen.chooseNum(-1e6f, 1e6f))
    check(Prop.forAll(vec) { xs =>
      val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs.toArray)
      val s = SketchOps.int8Scale(a)
      val codes = SketchOps.int8Codes(a)
      val ref = xs.map(x =>
        if (s == 0.0) 0L else math.floor(x.toDouble / s + 0.5).toLong)
      val got = (0 until codes.numElements()).map(codes.getByte(_).toLong)
      got == ref && got.forall(c => c >= -127 && c <= 127)
    })
  }

  test("rolling fingerprint: shift-invariant minimum over shared windows") {
    val toks = Seq.fill(50)(scala.util.Random.nextLong())
    val a = arr(toks)
    val b = arr(Seq(1L, 2L) ++ toks) // prefix added: superset of windows
    val fa = SketchOps.rollingMinFingerprint(a, 5)
    val fb = SketchOps.rollingMinFingerprint(b, 5)
    assert(fb <= fa)
  }

  test("topNgramFractions equals the brute-force string-gram mode (property)") {
    // brute force: tokenize exactly like split(lower(trim(text)),'\s+'),
    // build gram STRINGS, count the mode — the kernel's hash-run-count
    // must agree (collisions aside, which the generator can't hit)
    def brute(s: String, n: Int): Double = {
      val toks = UTF8String.fromString(s).trim().toLowerCase.toString
        .split("\\s+", -1).toSeq
      val cnt = toks.length
      if (cnt < n) 0.0
      else {
        val grams = (0 to cnt - n).map(i => toks.slice(i, i + n).mkString(" "))
        val mode = grams.groupBy(identity).values.map(_.size).max
        math.min(1.0, mode.toDouble * n / cnt)
      }
    }
    // small vocabulary forces heavy repetition; whitespace variety (tabs,
    // newlines, runs, leading/trailing) exercises the tokenizer contract
    val word = Gen.oneOf("a", "b", "ab", "Xy", "ü", "词", "!", "a.b")
    val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = for {
      k <- Gen.chooseNum(0, 30)
      words <- Gen.listOfN(k, word)
      seps <- Gen.listOfN(math.max(0, k - 1), ws)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString +
      words.drop(seps.size).mkString + trail
    check(Prop.forAll(textGen, Gen.chooseNum(1, 4)) { (s, n) =>
      val got = SketchOps.topNgramFractions(
        UTF8String.fromString(s), Array(n)).getDouble(0)
      got == brute(s, n)
    })
  }

  test("bloom filter: no false negatives ever; FP rate sane at 16 bits/key") {
    val rng = new scala.util.Random(13)
    val members = Array.fill(5000)(rng.nextLong())
    val numBits = SketchOps.bloomNumBits(members.length, 16)
    val k = SketchOps.bloomK(16)
    val words = SketchOps.bloomAdd(
      new Array[Long](numBits / 64), numBits, k, members.iterator)
    assert(members.forall(SketchOps.bloomMightContain(words, k, _)),
      "bloom false negative")
    val probes = Array.fill(20000)(rng.nextLong())
      .filterNot(members.contains)
    val fp = probes.count(SketchOps.bloomMightContain(words, k, _))
    assert(fp.toDouble / probes.length < 0.01,
      s"FP rate ${fp.toDouble / probes.length} at 16 bits/key")
    // OR-merge of two halves ≡ single build
    val (h1, h2) = members.splitAt(members.length / 2)
    val merged = SketchOps.bloomOr(
      SketchOps.bloomAdd(new Array[Long](numBits / 64), numBits, k, h1.iterator),
      SketchOps.bloomAdd(new Array[Long](numBits / 64), numBits, k, h2.iterator))
    assert(java.util.Arrays.equals(merged, words))
  }

  test("deflateRatio: repetitive < prose < noise, deterministic, bounded") {
    import org.apache.spark.unsafe.types.UTF8String
    def r(s: String) = SketchOps.deflateRatio(UTF8String.fromString(s))
    val rep = "spam ham " * 500
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "considers whether compression ratios rank text quality well ") * 20
    val rng = new scala.util.Random(7)
    val noise = Array.fill(4000)((rng.nextInt(94) + 33).toChar).mkString
    assert(r(rep) < r(prose) && r(prose) < r(noise),
      s"${r(rep)} ${r(prose)} ${r(noise)}")
    assert(r(rep) < 0.05)   // near-pure repetition crushes
    assert(r(noise) > 0.8)  // incompressible stays near 1
    assert(r(rep) == r(rep) && r("") == 1.0) // deterministic; empty = 1.0
    assert(r(noise) > 0.0 && r(noise) < 1.5) // zlib overhead can exceed 1
  }

  test("cosineDouble matches cosineFloat on float-valued input") {
    val rng = new scala.util.Random(13)
    for (_ <- 1 to 20) {
      val af = Array.fill(16)(rng.nextFloat() - 0.5f)
      val bf = Array.fill(16)(rng.nextFloat() - 0.5f)
      val f = SketchOps.cosineFloat(
        new GenericArrayData(af), new GenericArrayData(bf))
      val d = SketchOps.cosineDouble(
        new GenericArrayData(af.map(_.toDouble)),
        new GenericArrayData(bf.map(_.toDouble)))
      assert(f == d) // float->double is exact; accumulation order identical
    }
  }

  test("cosineFloat symmetry and bounds") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val a = new GenericArrayData(Array.fill(16)(rng.nextFloat() - 0.5f))
      val b = new GenericArrayData(Array.fill(16)(rng.nextFloat() - 0.5f))
      val ab = SketchOps.cosineFloat(a, b)
      val ba = SketchOps.cosineFloat(b, a)
      assert(ab == ba)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }
}
