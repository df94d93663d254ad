package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.functions.GraftExpressions._
import graft.functions.TextAnalysis

/** Deduplication operators for training-data pipelines, each designed so the
  * pairwise stage never goes quadratic in corpus size:
  *
  *  - exact:       hash-groupBy — one shuffle on the content hash.
  *  - MinHash+LSH: shingle → signature → band → bucket-join; only rows
  *    sharing a band bucket are paired, with a bucket-size cap so a
  *    degenerate bucket can't explode quadratically.
  *  - SimHash:     64-bit fingerprint + pigeonhole banding on 16-bit chunks
  *    (any pair within Hamming distance 3 shares at least one of 4 chunks).
  *  - n-gram Jaccard: exact verify on LSH candidates only.
  *  - embedding near-dup: random-hyperplane LSH buckets + exact cosine on
  *    bucket-mates only.
  *
  * All sketches are computed by codegen'd native expressions
  * ([[graft.functions.GraftExpressions]]) — one kernel call per row.
  */
object Dedup {

  /** Exact dedup: group identical content, keep the smallest id.
    * O(n) map + one shuffle on md5(text); at 100 TB this is the plain
    * hash-aggregate Spark already does well. Output: one row per distinct
    * content with the surviving id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).alias("keep_id"), count(lit(1)).alias("n_copies"))
      .select(md5(col(textCol).cast(BinaryType)).alias("content_hash"),
        col("keep_id"), col("n_copies"))

  /** MinHash signatures: distinct character-`shingleN`-gram hashes → k
    * universal-hash minima. One narrow pass, no shuffle.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, k: Int = 128): DataFrame =
    df.select(col(idCol),
      minhash_signature(shingle_hashes(col(textCol), shingleN), k).alias("sig"))

  /** LSH candidate pairs: band the signature, bucket-join, emit (id_a, id_b)
    * with id_a < id_b. `maxBucket` caps degenerate buckets (e.g. empty or
    * boilerplate documents all sharing a band): a bucket with b rows emits
    * b² pairs, so unbounded buckets are the scale killer. Dropped buckets
    * are counted in the `_dropped_buckets` accumulator-free way: callers
    * can observe them via [[lshBuckets]] directly.
    */
  def minhashCandidates(signatures: DataFrame, idCol: String,
      bands: Int = 32, maxBucket: Int = 1000): DataFrame = {
    val banded = lshBuckets(signatures, idCol, bands)
    val capped = banded
      .withColumn("_bucket_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash"))))
      .where(col("_bucket_size") <= maxBucket)
      .drop("_bucket_size")
    val a = capped.alias("a")
    val b = capped.alias("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").alias("id_a"), col(s"b.$idCol").alias("id_b"))
      .distinct()
  }

  /** Explode a signature into (id, band, band_hash) rows — the LSH bucket
    * key. Same-bucket rows are near-dup candidates.
    */
  def lshBuckets(signatures: DataFrame, idCol: String, bands: Int): DataFrame = {
    signatures
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          i => xxhash64(slice(col("sig"), i * (size(col("sig")) / bands) + 1,
            size(col("sig")) / bands), i))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Exact n-gram Jaccard similarity on candidate pairs only (the verify
    * stage after LSH): J = |A∩B| / |A∪B| over distinct shingle hashes.
    */
  def jaccardVerify(candidates: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 5, threshold: Double = 0.8): DataFrame = {
    val shingles = df.select(col(idCol).alias("_sid"),
      shingle_hashes(col(textCol), shingleN).alias("_sh"))
    candidates
      .join(shingles.withColumnRenamed("_sid", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
      .join(shingles.withColumnRenamed("_sid", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * exact Jaccard verification. The only joins are bucket-local.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, shingleN, k)
    val cands = minhashCandidates(sigs, idCol, bands)
    jaccardVerify(cands, df, idCol, textCol, shingleN, threshold)
  }

  /** SimHash near-dup: 64-bit fingerprints; pairs within `maxHamming` ≤ 3
    * found via pigeonhole on 4 × 16-bit chunks (a pair differing in ≤3 bits
    * must agree on ≥1 chunk), then exact Hamming verify.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol), TextAnalysis.simhash(col(textCol)).alias("fp"))
    val chunkStructs = (0 until 4).map(i => struct(
      lit(i).alias("chunk"),
      shiftright(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL)).alias("chunk_val")))
    val chunked = fp
      .select(col(idCol), col("fp"), explode(array(chunkStructs: _*)).alias("_c"))
      .select(col(idCol), col("fp"), col("_c.chunk").alias("chunk"),
        col("_c.chunk_val").alias("chunk_val"))
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").alias("id_a"), col(s"b.$idCol").alias("id_b"),
        hamming64(col("a.fp"), col("b.fp")).alias("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding near-dup: same-bucket candidates via random-hyperplane LSH,
    * exact cosine verify. Bucket width `numPlanes` trades recall for pair
    * count (16 planes ⇒ 65536 buckets).
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, numPlanes: Int = 12): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol),
      projection_bits(col(vecCol), numPlanes, dim).alias("bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").alias("id_a"), col(s"b.$idCol").alias("id_b"),
        cosine_sim(col(s"a.$vecCol"), col(s"b.$vecCol")).alias("cosine"))
      .where(col("cosine") >= threshold)
  }
}
