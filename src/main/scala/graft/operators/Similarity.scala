package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact baseline. Queries are broadcast; cosine runs
  *    map-side over the data scan; per-query top-k uses a partial-aggregating
  *    heap so the shuffle moves O(queries × k × partitions) rows — never the
  *    n_queries × n_vectors pair table a window-rank plan would shuffle.
  *  - [[lshTopK]]: the scale path. Random-hyperplane buckets prune the
  *    candidate set to same-bucket vectors; exact cosine re-ranks.
  */
object Similarity {

  /** Per-query top-k accumulator: a bounded sorted buffer merged
    * associatively — Spark runs it as a partial aggregation (map-side
    * top-k per partition, then a tiny merge).
    */
  class TopK(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
      s.sortBy { case (id, score) => (-score, id) }.take(k)
    override def zero: Seq[(Long, Double)] = Seq.empty
    override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
      trim(b :+ a)
    override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
      trim(b1 ++ b2)
    override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param data    (idCol, vecCol) corpus
    * @param queries (queryIdCol, vecCol) — small; broadcast
    * @return (query_id, neighbor_id, cosine, rank) — excludes self-matches
    */
  def bruteForceTopK(data: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).alias("query_id"),
      col(vecCol).alias("_qvec")))
    val scored = Dedup.widen(data).join(q, col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).alias("neighbor_id"),
        cosine_sim(col(vecCol), col("_qvec")).alias("cosine"))
    topKPerQuery(scored, k)
  }

  /** LSH-pruned ANN: only vectors sharing one of the query's probe buckets
    * are scored. Bucketing is a deterministic map-side expression on both
    * sides; multi-probe (all buckets within Hamming distance 1 of the
    * query's bucket) recovers most of the recall a single probe loses —
    * the query side fans out ×(numPlanes+1) but stays tiny and broadcast.
    */
  def lshTopK(data: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, dim: Int,
      numPlanes: Int = 10, multiProbe: Boolean = true): DataFrame = {
    val d = Dedup.widen(data).select(col(idCol), col(vecCol),
      projection_bits(col(vecCol), numPlanes, dim).alias("_bucket"))
    val qbucket = projection_bits(col(vecCol), numPlanes, dim)
    val probes =
      if (multiProbe)
        array(qbucket +: (0 until numPlanes).map(b =>
          qbucket.bitwiseXOR(lit(1 << b))): _*)
      else array(qbucket)
    val q = broadcast(queries.select(col(queryIdCol).alias("query_id"),
      col(vecCol).alias("_qvec"), explode(probes).alias("_qbucket")))
    val scored = d.join(q,
        col("_bucket") === col("_qbucket") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).alias("neighbor_id"),
        cosine_sim(col(vecCol), col("_qvec")).alias("cosine"))
    topKPerQuery(scored, k)
  }

  /** Shared reduce: per-query bounded top-k with map-side partial
    * aggregation, then explode to (query_id, neighbor_id, cosine, rank).
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopK(k).toColumn
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .flatMap { case (qid, items) =>
        items.zipWithIndex.map { case ((nid, score), i) => (qid, nid, score, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Recall@k of an ANN result against the exact baseline (test metric). */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select("query_id", "neighbor_id")
    val a = approx.select("query_id", "neighbor_id")
    val hit = e.join(a, Seq("query_id", "neighbor_id"), "left_semi").count()
    val total = e.count()
    if (total == 0) 0.0 else hit.toDouble / total
  }
}
