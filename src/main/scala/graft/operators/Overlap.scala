package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions.word_ngram_hashes

/** Corpus-LEVEL n-gram overlap diagnostics — "how much of corpus B is
  * already in corpus A?", the question asked before mixing a new source
  * into a training corpus (and the corpus-scale cousin of per-document
  * dedup / decontamination, which answer it per row). No reference analog;
  * extends the pipeline surface like [[Sampling]]/[[Splits]].
  *
  * Both variants run on the distinct word-n-gram sets of each corpus.
  * Grams are the FNV-hashed [[word_ngram_hashes]] longs (distinct and
  * sorted per document by the kernel), so results are exact modulo 64-bit
  * hash collisions — the same contract as the ExactSubstr gate, and what
  * lets the DuckDB oracle recompute the counts from gram STRINGS.
  */
object Overlap {

  /** EXACT overlap of the two corpora's distinct word-n-gram sets: one row
    * `(n_a, n_b, n_common, jaccard)`.
    *
    * One shuffle total: both corpora's gram streams are tagged and unioned
    * BEFORE the group-by, so Spark's partial aggregation collapses
    * within-partition duplicates map-side and only distinct (gram, flags)
    * partials move; the final single-row agg is a second, |grams|→1
    * reduction. Nothing pairs and nothing is quadratic — at 100 TB this is
    * two scans and one distinct-sized exchange, the same shape as exact
    * dedup.
    */
  def ngramOverlap(a: DataFrame, b: DataFrame, textCol: String,
      n: Int = 3): DataFrame = {
    def grams(df: DataFrame, aFlag: Int, bFlag: Int) =
      df.select(explode(word_ngram_hashes(col(textCol), n)).alias("gram"))
        .select(col("gram"), lit(aFlag).alias("_a"), lit(bFlag).alias("_b"))
    grams(a, 1, 0).unionAll(grams(b, 0, 1))
      .groupBy(col("gram"))
      .agg(max(col("_a")).alias("ina"), max(col("_b")).alias("inb"))
      .agg(
        // gram-less corpora (every doc shorter than n tokens) leave the
        // global agg with ZERO input rows — sums go null and a caller's
        // getLong throws; the empty overlap is all-zeros (review r9)
        coalesce(sum(col("ina")), lit(0L)).cast("long").alias("n_a"),
        coalesce(sum(col("inb")), lit(0L)).cast("long").alias("n_b"),
        coalesce(sum(col("ina") * col("inb")), lit(0L)).cast("long")
          .alias("n_common"),
        coalesce(sum(col("ina") * col("inb")).cast("double") / count(lit(1)),
          lit(0.0)).alias("jaccard"))
  }

  /** Per-GROUP exact overlap (e.g. per language): one row per group value
    * with the same counts/Jaccard plus `containment_b` = |A∩B| / |B| —
    * "how much of the new snapshot's material already exists in the old"
    * — the corpus-diff question asked per stratum. Same single tagged
    * distinct-shuffle as [[ngramOverlap]], keyed by (group, gram).
    * Groups absent from one side report zero overlap rather than
    * disappearing (full outer on the group key via flag maxes).
    */
  def ngramOverlapBy(a: DataFrame, b: DataFrame, textCol: String,
      byCol: String, n: Int = 3): DataFrame = {
    def grams(df: DataFrame, aFlag: Int, bFlag: Int) =
      df.select(col(byCol),
          explode(word_ngram_hashes(col(textCol), n)).alias("gram"))
        .select(col(byCol), col("gram"),
          lit(aFlag).alias("_a"), lit(bFlag).alias("_b"))
    grams(a, 1, 0).unionAll(grams(b, 0, 1))
      .groupBy(col(byCol), col("gram"))
      .agg(max(col("_a")).alias("ina"), max(col("_b")).alias("inb"))
      .groupBy(col(byCol))
      .agg(
        sum(col("ina")).cast("long").alias("n_a"),
        sum(col("inb")).cast("long").alias("n_b"),
        sum(col("ina") * col("inb")).cast("long").alias("n_common"),
        (sum(col("ina") * col("inb")).cast("double") / count(lit(1)))
          .alias("jaccard"),
        (sum(col("ina") * col("inb")).cast("double") /
          greatest(sum(col("inb")).cast("double"), lit(1.0)))
          .alias("containment_b"))
  }

  /** Bounded smallest-k DISTINCT accumulator over gram hashes — the
    * bottom-k sketch buffer. Kept sorted so the common full-buffer reject
    * is O(1) and duplicate detection is a binary search; merged
    * associatively, so Spark runs it as a partial aggregation (the
    * [[Sampling]]/[[Similarity.TopK]] pattern): each task ships at most k
    * longs, never its gram stream.
    */
  private class BottomK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)
    override def zero: Seq[Long] = Seq.empty
    override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
      if (b.size >= k && a >= b.last) return b
      import scala.collection.Searching._
      b.search(a) match {
        case Found(_) => b
        case InsertionPoint(i) =>
          val ins = (b.take(i) :+ a) ++ b.drop(i)
          if (ins.size > k) ins.take(k) else ins
      }
    }
    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = trim(b1 ++ b2)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  /** Bottom-k sketch ESTIMATE of the same Jaccard — the scale path when
    * even one distinct-sized exchange is too much (estimating overlap
    * between two 100 TB corpora): each corpus reduces to its k smallest
    * distinct gram hashes via partial aggregation (k longs per task on the
    * wire, k longs to the driver), and the driver combines the two
    * sketches with the standard bottom-k estimator
    * `|kmin(A∪B) ∩ A ∩ B| / |kmin(A∪B)|`. Deterministic (the gram hash is
    * fixed, no sampling randomness), standard error ≈ sqrt(J(1−J)/k).
    * Returns one row `(jaccard_est, k)`.
    */
  def ngramOverlapEstimate(a: DataFrame, b: DataFrame, textCol: String,
      n: Int = 3, k: Int = 512): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = a.sparkSession
    import spark.implicits._
    val agg = new BottomK(k).toColumn
    def sig(df: DataFrame): Seq[Long] =
      df.select(explode(word_ngram_hashes(col(textCol), n)).alias("gram"))
        .as[Long].select(agg).head()
    val sa = sig(a)
    val sb = sig(b)
    val kminUnion = (sa ++ sb).distinct.sorted.take(k)
    val both = sa.toSet intersect sb.toSet
    val est =
      if (kminUnion.isEmpty) 0.0
      else kminUnion.count(both.contains).toDouble / kminUnion.size
    Seq((est, k)).toDF("jaccard_est", "k")
  }
}
