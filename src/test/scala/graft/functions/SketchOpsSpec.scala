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

  test("rolling fingerprint: shift-invariant minimum over shared windows") {
    val toks = Seq.fill(50)(scala.util.Random.nextLong())
    val a = arr(toks)
    val b = arr(Seq(1L, 2L) ++ toks) // prefix added: superset of windows
    val fa = SketchOps.rollingMinFingerprint(a, 5)
    val fb = SketchOps.rollingMinFingerprint(b, 5)
    assert(fb <= fa)
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
