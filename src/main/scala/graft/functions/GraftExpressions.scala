package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.graftbridge.TypeBridge.AbstractType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's sketch/text kernels.
  *
  * Each generates code that calls the matching [[SketchOps]] kernel — a
  * single static call per row inside whole-stage codegen (no interpreted
  * expression-tree overhead, no UDF serialization). Kernels are
  * deterministic: fixed hash constants, fixed accumulation order.
  */
object GraftExpressions {

  /** `to_alphanum(s, len)` — HANA ALPHANUM conversion semantics
    * (reference workload `src/test/resources/VBAK_change.sql:1`):
    * digit-only strings are zero-padded to `len`, everything else passes
    * through unchanged.
    */
  case class ToAlphanum(child: Expression, length: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.alphanumPad(v.asInstanceOf[UTF8String], length)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.alphanumPad($c, $length)")
    override protected def withNewChildInternal(c: Expression): ToAlphanum = copy(child = c)
  }

  /** `minhash_signature(array<long>, k)` — k-minima universal-hash signature
    * of an element set (MinHash). One pass per row.
    */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(k > 0 && k <= 1024, "k in 1..1024")
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.minhash(v.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.minhash($c, $k)")
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  }

  /** `simhash64(array<long>)` — 64-bit SimHash of pre-hashed tokens. */
  case class SimHash64(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.simhash(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.simhash($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  /** `cosine_sim(array<float>, array<float>)` — cosine similarity, double
    * accumulation in fixed order (bit-deterministic).
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SketchOps.cosineFloat($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  /** `deflate_ratio(string)` — zlib-deflate compressed/raw byte ratio, the
    * compressibility quality signal (Gopher-style repetition filtering).
    */
  case class DeflateRatio(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.deflateRatio(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.deflateRatio($c)")
    override protected def withNewChildInternal(c: Expression): DeflateRatio =
      copy(child = c)
  }

  /** `cosine_sim_d(array<double>, array<double>)` — cosine similarity with
    * the same fixed-order double accumulation as [[CosineSim]]; the
    * double-vector form k-means needs for data-vs-centroid scoring.
    */
  case class CosineSimD(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.cosineDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SketchOps.cosineDouble($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimD =
      copy(left = l, right = r)
  }

  /** `hamming64(long, long)` — Hamming distance of two 64-bit fingerprints. */
  case class Hamming64(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(LongType, LongType)
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 =
      copy(left = l, right = r)
  }

  /** `zorder2(long, long)` — 62-bit Morton interleave of two values in
    * [0, 2^31); the sort key for Z-ordered clustered compaction (see
    * [[SketchOps.zorder2]]).
    */
  case class ZOrder2(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.zorder2(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SketchOps.zorder2($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
      copy(left = l, right = r)
  }

  /** `shingle_hashes(string, n)` — distinct FNV-hashed character n-grams. */
  case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression
      with ImplicitCastInputTypes {
    require(n > 0, "n > 0")
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.shingleHashes(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.shingleHashes($c, $n)")
    override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  }

  /** `int8_scale(array<float>)` — symmetric int8 quantization scale
    * (max|v|/127; 0.0 for zero/empty vectors).
    */
  case class Int8Scale(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.int8Scale(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.int8Scale($c)")
    override protected def withNewChildInternal(c: Expression): Int8Scale = copy(child = c)
  }

  /** `int8_codes(array<float>)` — int8 codes under `int8_scale`
    * (floor(v/scale + 0.5), exactly reproducible IEEE arithmetic).
    */
  case class Int8Codes(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.int8Codes(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.int8Codes($c)")
    override protected def withNewChildInternal(c: Expression): Int8Codes = copy(child = c)
  }

  /** `wordpiece_tokens(string)` — greedy longest-match WordPiece against a
    * plan-static vocabulary (continuations `##`-prefixed, unmatched words
    * `[UNK]`). The vocab set rides the generated code's reference array —
    * one HashSet per plan, not per row.
    */
  case class WordpieceTokens(child: Expression, vocab: Seq[String])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(vocab.nonEmpty, "vocab must not be empty")
    @transient private lazy val set = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }
    @transient private lazy val maxLen = vocab.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.wordpieceTokens(v.asInstanceOf[UTF8String], set, maxLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wpVocab", set, "java.util.HashSet")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.wordpieceTokens($c, $ref, $maxLen)")
    }
    override protected def withNewChildInternal(c: Expression): WordpieceTokens =
      copy(child = c)
  }

  /** `nfc_norm(string)` — Unicode NFC canonical composition (see
    * [[SketchOps.nfcNormalize]]).
    */
  case class NfcNorm(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.nfcNormalize(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.nfcNormalize($c)")
    override protected def withNewChildInternal(c: Expression): NfcNorm =
      copy(child = c)
  }

  /** `byte_encode(string)` — UTF-8 bytes as GPT-2 byte-visible chars
    * ([[SketchOps.byteEncode]]): the byte-level tokenizer alphabet.
    */
  case class ByteEncode(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.byteEncode(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.byteEncode($c)")
    override protected def withNewChildInternal(c: Expression): ByteEncode =
      copy(child = c)
  }

  /** `byte_decode(string)` — inverse of [[ByteEncode]], loud on
    * non-alphabet chars.
    */
  case class ByteDecode(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.byteDecode(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.byteDecode($c)")
    override protected def withNewChildInternal(c: Expression): ByteDecode =
      copy(child = c)
  }

  /** `hashed_bow_score(string)` — fastText-style hashed bag-of-words
    * linear score under plan-static integer milli-weights (see
    * [[SketchOps.hashedBowScore]]).
    */
  case class HashedBowScore(child: Expression, weights: Seq[Int])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(weights.nonEmpty && (weights.size & (weights.size - 1)) == 0,
      s"weights size must be a power of two (unsigned-mod bucketing), " +
        s"got ${weights.size}")
    @transient private lazy val arr = weights.toArray
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.hashedBowScore(v.asInstanceOf[UTF8String], arr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bowWeights", arr, "int[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.hashedBowScore($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): HashedBowScore =
      copy(child = c)
  }

  /** `int8_dot(array<byte>, array<byte>)` — exact integer dot product of
    * two int8 code vectors (compressed-domain ANN scoring).
    */
  case class Int8Dot(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(ByteType), ArrayType(ByteType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.int8Dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SketchOps.int8Dot($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8Dot =
      copy(left = l, right = r)
  }

  /** `fnv64(string)` — whole-string FNV-1a/64 codepoint hash, the
    * cross-engine scalar hash (see [[SketchOps.fnv64]]); feeds the HLL
    * registers so distinct estimates replay in the oracle.
    */
  case class Fnv64(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.fnv64(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.fnv64($c)")
    override protected def withNewChildInternal(c: Expression): Fnv64 = copy(child = c)
  }

  /** `fnv_token_hashes(string)` — per-token FNV-1a/64 hashes (codepoint
    * fold) of the whitespace tokenization; the oracle-reproducible input to
    * `simhash64` / `rolling_fingerprint`.
    */
  case class FnvTokenHashes(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.fnvTokenHashes(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.fnvTokenHashes($c)")
    override protected def withNewChildInternal(c: Expression): FnvTokenHashes = copy(child = c)
  }

  /** `word_ngram_hashes(string, n)` — distinct FNV-hashed word n-grams
    * (whitespace-tokenized, single-space normalized).
    */
  case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression
      with ImplicitCastInputTypes {
    require(n > 0, "n > 0")
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.wordNgramHashes(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.wordNgramHashes($c, $n)")
    override protected def withNewChildInternal(c: Expression): WordNgramHashes = copy(child = c)
  }

  /** `word_ngram_hash_seq(string, n)` — POSITIONAL hashed word n-grams
    * (index = token position, duplicates kept) — the gram explode feeding
    * [[graft.operators.Dedup.duplicatedSpans]].
    */
  case class WordNgramHashSeq(child: Expression, n: Int) extends UnaryExpression
      with ImplicitCastInputTypes {
    require(n > 0, "n > 0")
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.wordNgramHashSeq(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.wordNgramHashSeq($c, $n)")
    override protected def withNewChildInternal(c: Expression): WordNgramHashSeq =
      copy(child = c)
  }

  /** `remove_spans(text, starts, ends)` — cut sorted disjoint token spans
    * out of the text ([[graft.operators.Dedup.removeDuplicatedSpans]]'s
    * rebuild step).
    */
  case class RemoveSpans(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(StringType, ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any, c: Any): Any =
      SketchOps.removeSpans(a.asInstanceOf[UTF8String],
        b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) =>
        s"graft.functions.SketchOps.removeSpans($a, $b, $c)")
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression): RemoveSpans = copy(first = f, second = s, third = t)
  }

  /** `jaccard_sorted(array<long>, array<long>)` — exact Jaccard of two
    * sorted distinct arrays (merge pass; pairs with [[ShingleHashes]]).
    */
  case class JaccardSorted(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.SketchOps.jaccardSorted($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
      copy(left = l, right = r)
  }

  /** `rolling_fingerprint(array<long>, window)` — winnowing-style min rolling
    * polynomial hash over token-hash windows.
    */
  case class RollingFingerprint(child: Expression, window: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(window > 0, "window > 0")
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.rollingMinFingerprint(v.asInstanceOf[ArrayData], window)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.rollingMinFingerprint($c, $window)")
    override protected def withNewChildInternal(c: Expression): RollingFingerprint =
      copy(child = c)
  }

  /** `projection_bits(array<float>)` — packed sign bits of deterministic
    * random-hyperplane projections (the bucket id for embedding LSH).
    * Planes are generated once on the driver and embedded in the plan.
    */
  case class ProjectionBits(child: Expression, numPlanes: Int, dim: Int, seed: Long)
      extends UnaryExpression with ImplicitCastInputTypes {
    // numPlanes = 0 is the degenerate-exact configuration: zero
    // hyperplanes put every vector in bucket 0, so bucket-local pairing
    // becomes the exact all-pairs verify — what the hash-gated dedup gate
    // runs (production pruning configs keep numPlanes >= 1)
    require(numPlanes >= 0 && numPlanes <= 30, "numPlanes in 0..30")
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    @transient private lazy val planes = SketchOps.hyperplanes(numPlanes, dim, seed)
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.projectionBits(v.asInstanceOf[ArrayData], planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.projectionBits($c, $planesRef)")
    }
    override protected def withNewChildInternal(c: Expression): ProjectionBits =
      copy(child = c)
  }

  /** `bucket_near_pairs(members, threshold)` — in-bucket near-dup pair
    * scan over array<struct<id,vec>> sorted by id; returns
    * array<struct<id_a,id_b,cosine>> of the ≥threshold pairs. The kernel
    * behind [[graft.operators.Dedup.embeddingNearDups]]'s verify stage.
    */
  case class BucketNearPairs(child: Expression, threshold: Double)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("vec", ArrayType(FloatType))))))
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id_a", LongType), StructField("id_b", LongType),
      StructField("cosine", DoubleType))))
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.bucketNearPairs(v.asInstanceOf[ArrayData], threshold)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.bucketNearPairs($c, ${threshold}D)")
    override protected def withNewChildInternal(c: Expression): BucketNearPairs =
      copy(child = c)
  }

  /** `top_ngram_fractions(text, ns)` — Gopher top-n-gram repetition
    * fractions for every n in `ns` over ONE shared tokenization (the
    * boilerplate quality filter). One static kernel call per row inside
    * whole-stage codegen; see [[SketchOps.topNgramFractions]].
    */
  case class TopNgramFractions(child: Expression, ns: Seq[Int])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(ns.nonEmpty && ns.forall(_ >= 1),
      s"n-gram orders must be >= 1, got $ns")
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true
    @transient private lazy val nsArr = ns.toArray
    override def nullSafeEval(v: Any): Any =
      SketchOps.topNgramFractions(v.asInstanceOf[UTF8String], nsArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val nsRef = ctx.addReferenceObj("ns", nsArr, "int[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.topNgramFractions($c, $nsRef)")
    }
    override protected def withNewChildInternal(c: Expression): TopNgramFractions =
      copy(child = c)
  }

  /** `bloom_might_contain(hash)` — membership probe against a driver-built
    * bloom filter embedded in the plan (the map-side prefilter of
    * [[graft.operators.Decontaminate.overlapBloom]]). false is definite
    * absence; true is verified downstream by an exact join.
    */
  case class BloomMightContain(child: Expression, words: Array[Long], k: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(words.nonEmpty && (words.length & (words.length - 1)) == 0,
      "bloom word count must be a power of two")
    override def inputTypes: Seq[AbstractType] = Seq(LongType)
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.bloomMightContain(words, k, v.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.bloomMightContain($wordsRef, $k, $c)")
    }
    override protected def withNewChildInternal(c: Expression): BloomMightContain =
      copy(child = c)
  }

  /** `hll_estimate(sketch)` — distinct-count estimate from dense HLL
    * registers (the read side of [[graft.operators.IncrementalAgg]]'s
    * maintainable distinct).
    */
  case class HllEstimate(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.hllEstimate(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.hllEstimate($c)")
    override protected def withNewChildInternal(c: Expression): HllEstimate =
      copy(child = c)
  }

  /** `pq_encode(vec)` — product-quantization codes (m bytes) for a float
    * vector, against driver-trained codebooks embedded in the plan.
    */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.pqEncode(v.asInstanceOf[ArrayData], codebooks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.pqEncode($c, $cbRef)")
    }
    override protected def withNewChildInternal(c: Expression): PqEncode =
      copy(child = c)
  }

  /** `pq_adc_cosine(queryVec, codes)` — asymmetric cosine of a full query
    * vector against a PQ code (candidate side reads m bytes, not 4·dim).
    */
  case class PqAdcCosine(left: Expression, right: Expression,
      codebooks: Array[Array[Array[Float]]])
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(FloatType), BinaryType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(q: Any, c: Any): Any =
      SketchOps.pqAdcCosine(q.asInstanceOf[ArrayData],
        c.asInstanceOf[Array[Byte]], codebooks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
      defineCodeGen(ctx, ev, (q, c) =>
        s"graft.functions.SketchOps.pqAdcCosine($q, $c, $cbRef)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcCosine =
      copy(left = l, right = r)
  }

  /** `st_point(x, y)` — WKB point constructor (ST_POINT carrier, §1.2). */
  case class StPoint(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(DoubleType, DoubleType)
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.wkbPoint(a.asInstanceOf[Double], b.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchOps.wkbPoint($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StPoint =
      copy(left = l, right = r)
  }

  /** `st_x(wkb)` / `st_y(wkb)` — WKB point coordinate accessors. */
  case class StCoord(child: Expression, idx: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(idx == 0 || idx == 1, "idx 0=x 1=y")
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.wkbPointCoord(v.asInstanceOf[Array[Byte]], idx)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.wkbPointCoord($c, $idx)")
    override protected def withNewChildInternal(c: Expression): StCoord = copy(child = c)
  }

  /** `st_linestring(xs, ys)` — WKB LineString constructor from parallel
    * coordinate arrays (ST_GEOMETRY beyond points, §1.2).
    */
  case class StLineString(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.wkbLineString(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchOps.wkbLineString($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StLineString =
      copy(left = l, right = r)
  }

  /** `st_geomtype(wkb)` — geometry-type name of any WKB value. */
  case class StGeomType(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(SketchOps.wkbGeomType(v.asInstanceOf[Array[Byte]]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString(graft.functions.SketchOps.wkbGeomType($c))")
    override protected def withNewChildInternal(c: Expression): StGeomType = copy(child = c)
  }

  /** `st_npoints(wkb)` — vertex count of point/linestring/polygon WKB. */
  case class StNumPoints(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.wkbNumPoints(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.wkbNumPoints($c)")
    override protected def withNewChildInternal(c: Expression): StNumPoints = copy(child = c)
  }

  /** `st_xmin/ymin/xmax/ymax(wkb)` — envelope accessors (which: 0..3). */
  case class StExtent(child: Expression, which: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(which >= 0 && which <= 3, "which 0=xmin 1=ymin 2=xmax 3=ymax")
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.wkbExtent(v.asInstanceOf[Array[Byte]], which)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.wkbExtent($c, $which)")
    override protected def withNewChildInternal(c: Expression): StExtent = copy(child = c)
  }

  /** `st_collect(array<wkb>)` — Multi* / GeometryCollection constructor:
    * homogeneous members yield MULTIPOINT/MULTILINESTRING/MULTIPOLYGON,
    * mixed yield GEOMETRYCOLLECTION (completes ST_GEOMETRY's surface,
    * `S4HanaTableMapping.java:670`).
    */
  case class StCollect(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(ArrayType(BinaryType))
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.wkbCollect(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.wkbCollect($c)")
    override protected def withNewChildInternal(c: Expression): StCollect = copy(child = c)
  }

  /** `st_srid(wkb)` — spatial reference id (EWKB header; 0 when absent). */
  case class StSrid(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      SketchOps.wkbSrid(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.wkbSrid($c)")
    override protected def withNewChildInternal(c: Expression): StSrid = copy(child = c)
  }

  /** `st_distance(a, b)` — planar Euclidean distance between WKB points
    * (HANA ST_Distance on the default SRS); NaN for non-points.
    */
  case class StDistance(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.wkbPointDistance(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchOps.wkbPointDistance($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StDistance =
      copy(left = l, right = r)
  }

  /** `st_set_srid(wkb, srid)` — stamp/replace the EWKB SRID header. */
  case class StSetSrid(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractType] = Seq(BinaryType, IntegerType)
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.wkbSetSrid(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchOps.wkbSetSrid($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StSetSrid =
      copy(left = l, right = r)
  }

  // ── Column-API wrappers ─────────────────────────────────────────────────
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def to_alphanum(col: Column, length: Int = 10): Column = c(ToAlphanum(e(col), length))
  def minhash_signature(col: Column, k: Int): Column = c(MinHashSignature(e(col), k))
  def simhash64(col: Column): Column = c(SimHash64(e(col)))
  def cosine_sim(a: Column, b: Column): Column = c(CosineSim(e(a), e(b)))
  def cosine_sim_d(a: Column, b: Column): Column = c(CosineSimD(e(a), e(b)))
  def deflate_ratio(col: Column): Column = c(DeflateRatio(e(col)))
  def hamming64(a: Column, b: Column): Column = c(Hamming64(e(a), e(b)))
  def zorder2(a: Column, b: Column): Column = c(ZOrder2(e(a), e(b)))

  /** Wide-domain [[zorder2]] (VERDICT r10 #9): auto-bucketizes each input
    * into [0, 2^31) by `pmod` before interleaving, so a 2^40-key column
    * gets a working cluster key instead of a mid-rewrite runtime throw.
    * LOCALITY CAVEAT, by design and documented: `pmod` WRAPS the domain —
    * two keys 2^31 apart land on the same bucket value, so range locality
    * holds only within a 2^31-aligned window; for a domain already inside
    * [0, 2^31) the pmod is the identity and this IS `zorder2`. Callers
    * whose wide domain is dense and range-queried should RANK (dense ids)
    * instead of wrapping; callers whose keys are hash-like (the common
    * case for surrogate ids at 2^40) lose nothing — hash keys have no
    * range locality to preserve.
    */
  def zorder2_bucketized(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{lit, pmod}
    zorder2(pmod(a, lit(1L << 31)), pmod(b, lit(1L << 31)))
  }
  def jaccard_sorted(a: Column, b: Column): Column = c(JaccardSorted(e(a), e(b)))
  def fnv64(col: Column): Column = c(Fnv64(e(col)))
  def fnv_token_hashes(col: Column): Column = c(FnvTokenHashes(e(col)))
  def int8_scale(col: Column): Column = c(Int8Scale(e(col)))
  def int8_codes(col: Column): Column = c(Int8Codes(e(col)))
  def int8_dot(a: Column, b: Column): Column = c(Int8Dot(e(a), e(b)))
  def nfc_norm(col: Column): Column = c(NfcNorm(e(col)))
  def byte_encode(col: Column): Column = c(ByteEncode(e(col)))
  def byte_decode(col: Column): Column = c(ByteDecode(e(col)))
  def hashed_bow_score(col: Column, weights: Seq[Int]): Column =
    c(HashedBowScore(e(col), weights))
  def wordpiece_tokens(col: Column, vocab: Seq[String]): Column =
    c(WordpieceTokens(e(col), vocab))
  def shingle_hashes(col: Column, n: Int): Column = c(ShingleHashes(e(col), n))
  def word_ngram_hashes(col: Column, n: Int): Column = c(WordNgramHashes(e(col), n))
  def word_ngram_hash_seq(col: Column, n: Int): Column = c(WordNgramHashSeq(e(col), n))
  def remove_spans(text: Column, starts: Column, ends: Column): Column =
    c(RemoveSpans(e(text), e(starts), e(ends)))
  def rolling_fingerprint(col: Column, window: Int): Column =
    c(RollingFingerprint(e(col), window))
  def projection_bits(col: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column =
    c(ProjectionBits(e(col), numPlanes, dim, seed))
  def bucket_near_pairs(col: Column, threshold: Double): Column =
    c(BucketNearPairs(e(col), threshold))
  def top_ngram_fractions(col: Column, ns: Seq[Int]): Column =
    c(TopNgramFractions(e(col), ns))
  def bloom_might_contain(col: Column, words: Array[Long], k: Int): Column =
    c(BloomMightContain(e(col), words, k))
  def hll_estimate(col: Column): Column = c(HllEstimate(e(col)))
  def pq_encode(col: Column, codebooks: Array[Array[Array[Float]]]): Column =
    c(PqEncode(e(col), codebooks))
  def pq_adc_cosine(query: Column, codes: Column,
      codebooks: Array[Array[Array[Float]]]): Column =
    c(PqAdcCosine(e(query), e(codes), codebooks))

  def st_point(x: Column, y: Column): Column = c(StPoint(e(x), e(y)))
  def st_x(wkb: Column): Column = c(StCoord(e(wkb), 0))
  def st_y(wkb: Column): Column = c(StCoord(e(wkb), 1))
  def st_linestring(xs: Column, ys: Column): Column = c(StLineString(e(xs), e(ys)))
  def st_geomtype(wkb: Column): Column = c(StGeomType(e(wkb)))
  def st_npoints(wkb: Column): Column = c(StNumPoints(e(wkb)))
  def st_xmin(wkb: Column): Column = c(StExtent(e(wkb), 0))
  def st_ymin(wkb: Column): Column = c(StExtent(e(wkb), 1))
  def st_xmax(wkb: Column): Column = c(StExtent(e(wkb), 2))
  def st_ymax(wkb: Column): Column = c(StExtent(e(wkb), 3))
  def st_collect(geoms: Column): Column = c(StCollect(e(geoms)))
  def st_srid(wkb: Column): Column = c(StSrid(e(wkb)))
  def st_set_srid(wkb: Column, srid: Column): Column = c(StSetSrid(e(wkb), e(srid)))
  def st_distance(a: Column, b: Column): Column = c(StDistance(e(a), e(b)))

  private def intArg(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  /** (name, usage, builder) for every SQL-exposed kernel — the ONE
    * registry behind both [[registerAll]] (per-session temp functions) and
    * [[graft.GraftExtensions]] (spark.sql.extensions injection), so the
    * two registration paths cannot drift.
    */
  val sqlFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("to_alphanum", "HANA ALPHANUM zero-pad semantics",
      xs => ToAlphanum(xs.head, if (xs.size > 1) intArg(xs(1)) else 10)),
    ("minhash_signature", "k-minima MinHash signature of a hash set",
      xs => MinHashSignature(xs.head, intArg(xs(1)))),
    ("simhash64", "64-bit SimHash of pre-hashed tokens",
      xs => SimHash64(xs.head)),
    ("cosine_sim", "cosine similarity of two float vectors",
      xs => CosineSim(xs.head, xs(1))),
    ("cosine_sim_d", "cosine similarity of two double vectors",
      xs => CosineSimD(xs.head, xs(1))),
    ("deflate_ratio", "zlib compressed/raw byte ratio of a text",
      xs => DeflateRatio(xs.head)),
    ("hamming64", "Hamming distance of two 64-bit fingerprints",
      xs => Hamming64(xs.head, xs(1))),
    ("zorder2", "62-bit Morton interleave of two values in [0, 2^31)",
      xs => ZOrder2(xs.head, xs(1))),
    ("nfc_norm", "Unicode NFC canonical composition",
      xs => NfcNorm(xs.head)),
    ("jaccard_sorted", "exact Jaccard of two sorted distinct arrays",
      xs => JaccardSorted(xs.head, xs(1))),
    ("fnv_token_hashes", "per-token FNV-1a/64 codepoint hashes",
      xs => FnvTokenHashes(xs.head)),
    ("int8_scale", "symmetric int8 quantization scale (max|v|/127)",
      xs => Int8Scale(xs.head)),
    ("int8_codes", "int8 embedding codes under int8_scale",
      xs => Int8Codes(xs.head)),
    ("int8_dot", "exact integer dot product of int8 code vectors",
      xs => Int8Dot(xs.head, xs(1))),
    ("shingle_hashes", "distinct hashed character n-grams",
      xs => ShingleHashes(xs.head, intArg(xs(1)))),
    ("word_ngram_hashes", "distinct hashed word n-grams",
      xs => WordNgramHashes(xs.head, intArg(xs(1)))),
    ("word_ngram_hash_seq", "positional hashed word n-grams",
      xs => WordNgramHashSeq(xs.head, intArg(xs(1)))),
    ("remove_spans", "cut sorted disjoint token spans out of a text",
      xs => RemoveSpans(xs.head, xs(1), xs(2))),
    ("rolling_fingerprint", "winnowing min rolling hash fingerprint",
      xs => RollingFingerprint(xs.head, intArg(xs(1)))),
    ("top_ngram_fraction", "fraction of tokens covered by the top word n-gram",
      xs => GetArrayItem(TopNgramFractions(xs.head, Seq(intArg(xs(1)))), Literal(0))),
    ("hll_estimate", "distinct-count estimate from dense HLL registers",
      xs => HllEstimate(xs.head)),
    ("st_point", "little-endian WKB 2-D point",
      xs => StPoint(xs.head, xs(1))),
    ("st_x", "x coordinate of a WKB point", xs => StCoord(xs.head, 0)),
    ("st_y", "y coordinate of a WKB point", xs => StCoord(xs.head, 1)),
    ("st_linestring", "little-endian WKB LineString from coordinate arrays",
      xs => StLineString(xs.head, xs(1))),
    ("st_geomtype", "geometry-type name of a WKB value",
      xs => StGeomType(xs.head)),
    ("st_npoints", "vertex count of a WKB geometry",
      xs => StNumPoints(xs.head)),
    ("st_xmin", "envelope min x of a WKB geometry", xs => StExtent(xs.head, 0)),
    ("st_ymin", "envelope min y of a WKB geometry", xs => StExtent(xs.head, 1)),
    ("st_xmax", "envelope max x of a WKB geometry", xs => StExtent(xs.head, 2)),
    ("st_ymax", "envelope max y of a WKB geometry", xs => StExtent(xs.head, 3)),
    ("st_collect", "Multi* / GeometryCollection from an array of WKB values",
      xs => StCollect(xs.head)),
    ("st_srid", "EWKB spatial reference id (0 when absent)",
      xs => StSrid(xs.head)),
    ("st_set_srid", "stamp/replace the EWKB SRID header",
      xs => StSetSrid(xs.head, xs(1))),
    ("st_distance", "planar Euclidean distance between WKB points",
      xs => StDistance(xs.head, xs(1))))

  /** Register every kernel as a SQL function (int literals become the
    * static parameters), so `spark.sql("SELECT simhash64(...)")` works.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
