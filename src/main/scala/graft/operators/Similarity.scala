package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
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
    override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] = {
      // the buffer is kept sorted (trim's invariant): once full, the common
      // case — a row worse than the current k-th — is an O(1) reject with
      // no allocation, instead of a per-row re-sort
      if (k > 0 && b.size >= k) { // k>0 guard: b.last on empty would throw
        val (wid, wscore) = b.last
        if (a._2 < wscore || (a._2 == wscore && a._1 > wid)) return b
      }
      // accepted row: O(k) ordered splice into the sorted buffer instead of
      // an O(k log k) re-sort per insert
      val idx = b.indexWhere { case (id, score) =>
        score < a._2 || (score == a._2 && id > a._1) }
      val ins = if (idx < 0) b :+ a else (b.take(idx) :+ a) ++ b.drop(idx)
      if (ins.size > k) ins.take(k) else ins
    }
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
  private[operators] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
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

  /** IVF (inverted-file) ANN — the centroid-partitioned scale path:
    * k-means cells over the corpus, each vector indexed under its nearest
    * centroid; a query scores only vectors in its `nprobe` nearest cells.
    * Candidate volume is ~ nprobe/k of the corpus (vs. LSH's bucket-
    * collision volume), and the cell assignment is a plain column, so the
    * index join is an equi-join Spark shuffles/broadcasts like any other.
    *
    * Centroids are fit once (seeded k-means on a sample — deterministic for
    * a fixed input), broadcast everywhere; at 100 TB the fit runs on a
    * sample and assignment stays a map-side pass.
    */
  /** Seeded coarse-quantizer fit shared by [[ivfTopK]], [[ivfPqTopK]] and
    * the persisted [[AnnIndex]] — ONE definition so an index built today
    * and an in-memory query tomorrow cannot drift.
    *
    * Fits on a bounded sample with few iterations: centroid quality
    * saturates fast and the 100 TB plan can only ever fit on a sample.
    * The sample is the first `fitSampleSize` rows in id-HASH order
    * (TakeOrderedAndProject: per-partition bounded heap + tiny merge, no
    * count or extra shuffle pass): hash order is a fixed pseudo-random
    * permutation of the corpus, so the fit is DETERMINISTIC regardless of
    * partition/file-listing order and unbiased even on sorted or
    * partition-clustered corpora — a bare limit() would take whatever
    * scan splits finish first (ADVICE r2). Random init (seeded,
    * deterministic) over k-means||: the parallel init is itself several
    * distributed passes, and a coarse IVF quantizer needs cells of
    * roughly even mass, not optimal centers — 5 Lloyd iterations from a
    * random seed get there at a fraction of the cost.
    */
  private[operators] def fitCoarseQuantizer(data: DataFrame, idCol: String,
      vecCol: String, numCells: Int, seed: Long,
      fitSampleSize: Int): org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fitOn = data
      .select(array_to_vector(col(vecCol).cast("array<double>")).alias("_features"),
        xxhash64(col(idCol)).alias("_h"))
      .orderBy(col("_h"))
      .limit(fitSampleSize)
      .drop("_h")
    new KMeans().setK(numCells).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("_features").setPredictionCol("_cell")
      .fit(fitOn)
  }

  def ivfTopK(data: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, numCells: Int,
      nprobe: Int = 4, seed: Long = 42L, fitSampleSize: Int = 20000): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = data.sparkSession
    val feats = Dedup.widen(data)
      .select(col(idCol), col(vecCol),
        array_to_vector(col(vecCol).cast("array<double>")).alias("_features"))
    val model = fitCoarseQuantizer(data, idCol, vecCol, numCells, seed,
      fitSampleSize)
    val indexed = model.transform(feats).drop("_features")
    // centroids back to float arrays for the cosine kernel
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq
    import spark.implicits._
    val cellDf = broadcast(centroids.toDF("_cell", "_centroid"))
    // each query probes its nprobe nearest cells (tiny cross join)
    val q = queries.select(col(queryIdCol).alias("query_id"),
      col(vecCol).alias("_qvec"))
    val probes = q.crossJoin(cellDf)
      .withColumn("_csim", cosine_sim(col("_qvec"), col("_centroid")))
      .withColumn("_rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("_csim").desc, col("_cell"))))
      .where(col("_rnk") <= nprobe)
      .select(col("query_id"), col("_qvec"), col("_cell"))
    val scored = indexed.join(broadcast(probes),
        indexed("_cell") === probes("_cell") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).alias("neighbor_id"),
        cosine_sim(col(vecCol), col("_qvec")).alias("cosine"))
    topKPerQuery(scored, k)
  }

  /** Product-quantization ANN — the compressed-domain scale path beyond
    * IVF: vectors encode to m bytes (vs 4·dim float bytes — at 25B
    * embeddings that is ~200 GB of codes against ~6.4 TB of floats, an
    * in-memory scan vs a disk-bound one), queries score codes by
    * asymmetric cosine, and the exact vectors are touched only to REFINE
    * the top `refine·k` candidates per query. Codebooks train driver-side
    * by per-subspace Lloyd on a hash-ordered sample (deterministic for a
    * fixed corpus; PQ fits on samples by design) and broadcast in the
    * plan. The ADC scan is map-side against broadcast queries; both the
    * candidate and refine stages use the bounded-heap [[TopK]] partial
    * aggregation — nothing pair-shaped ever shuffles.
    *
    * @param m      subspaces (bytes per code); dim % m == 0
    * @param ksub   codewords per subspace (≤ 256)
    * @param refine exact-rerank multiplier: top refine·k ADC candidates
    *               per query are re-scored with true cosine
    */
  def pqTopK(data: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, dim: Int,
      m: Int = 8, ksub: Int = 256, refine: Int = 4,
      fitSampleSize: Int = 20000): DataFrame = {
    import graft.functions.SketchOps
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    require(ksub > 1 && ksub <= 256, s"ksub must be in 2..256, got $ksub")
    val spark = data.sparkSession
    import spark.implicits._
    // deterministic, partition-invariant sample: first N rows in id-hash
    // order (same rationale as ivfTopK's fit sample)
    val sample = data
      .select(col(vecCol).alias("_v"), xxhash64(col(idCol)).alias("_h"))
      .orderBy(col("_h")).limit(fitSampleSize)
      .select(col("_v")).as[Array[Float]].collect()
    val codebooks = SketchOps.pqTrain(sample, m, ksub)
    val encoded = Dedup.widen(data)
      .select(col(idCol), pq_encode(col(vecCol), codebooks).alias("_code"))
    val q = broadcast(queries.select(col(queryIdCol).alias("query_id"),
      col(vecCol).alias("_qvec")))
    val adc = encoded.join(q, col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).alias("neighbor_id"),
        pq_adc_cosine(col("_qvec"), col("_code"), codebooks).alias("cosine"))
    val candidates = topKPerQuery(adc, math.max(k, refine * k))
      .select(col("query_id"), col("neighbor_id"))
    // refine: exact cosine over the tiny candidate set only
    val exact = candidates
      .join(data.select(col(idCol).alias("neighbor_id"), col(vecCol)),
        Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col(vecCol), col("_qvec")).alias("cosine"))
    topKPerQuery(exact, k)
  }

  /** IVF-PQ — the composition both halves exist for (the standard
    * billion-scale ANN layout, e.g. FAISS IVF-PQ): coarse k-means cells
    * prune the corpus to `nprobe` cells per query, the survivors scan as
    * 8-byte PQ codes under asymmetric cosine, and the top refine·k
    * candidates re-score exactly. Candidate volume ≈ (nprobe/numCells) of
    * the corpus read at m bytes/vector — the only full-width vector reads
    * are the refine lookups.
    */
  def ivfPqTopK(data: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, dim: Int,
      numCells: Int, nprobe: Int = 4, m: Int = 8, ksub: Int = 256,
      refine: Int = 4, seed: Long = 42L,
      fitSampleSize: Int = 20000): DataFrame = {
    import graft.functions.SketchOps
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val spark = data.sparkSession
    import spark.implicits._
    // one hash-ordered sample feeds BOTH quantizers (coarse + product)
    val sampleDf = data
      .select(col(vecCol).alias("_v"), xxhash64(col(idCol)).alias("_h"))
      .orderBy(col("_h")).limit(fitSampleSize).select(col("_v"))
    val sample = sampleDf.as[Array[Float]].collect()
    val codebooks = SketchOps.pqTrain(sample, m, ksub)
    val coarse = new KMeans().setK(numCells).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("_features").setPredictionCol("_cell")
      .fit(sampleDf.select(
        array_to_vector(col("_v").cast("array<double>")).alias("_features")))
    // index: cell id + PQ code per vector, one map-side pass
    val indexed = coarse.transform(Dedup.widen(data)
        .select(col(idCol), col(vecCol),
          array_to_vector(col(vecCol).cast("array<double>")).alias("_features")))
      .select(col(idCol), col("_cell"),
        pq_encode(col(vecCol), codebooks).alias("_code"))
    val centroids = coarse.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq
    val cellDf = broadcast(centroids.toDF("_cell", "_centroid"))
    val q = queries.select(col(queryIdCol).alias("query_id"),
      col(vecCol).alias("_qvec"))
    val probes = q.crossJoin(cellDf)
      .withColumn("_csim", cosine_sim(col("_qvec"), col("_centroid")))
      .withColumn("_rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("_csim").desc, col("_cell"))))
      .where(col("_rnk") <= nprobe)
      .select(col("query_id"), col("_qvec"), col("_cell"))
    val adc = indexed.join(broadcast(probes),
        indexed("_cell") === probes("_cell") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).alias("neighbor_id"),
        pq_adc_cosine(col("_qvec"), col("_code"), codebooks).alias("cosine"))
    val candidates = topKPerQuery(adc, math.max(k, refine * k))
      .select(col("query_id"), col("neighbor_id"))
    val exact = candidates
      .join(data.select(col(idCol).alias("neighbor_id"), col(vecCol)),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col(vecCol), col("_qvec")).alias("cosine"))
    topKPerQuery(exact, k)
  }

  /** Per-group embedding centroids (mean pooling) — one row per (group,
    * dimension). Elements accumulate in EXACT decimal, so the sum is
    * order-independent and a cluster run reproduces local results bit-for-
    * bit (a double sum over a shuffled groupBy is not associative-stable);
    * the single division back to double is well-defined. One shuffle on
    * (group, dim): at 100 TB that is |groups| × dim keys with map-side
    * partial aggregation — never a vector-count-shaped exchange. Re-pack
    * rows into vectors with `collect_list` over a dim-sorted window only
    * when the consumer needs arrays; most do not.
    */
  /** Symmetric per-vector int8 quantization — 4× smaller embedding
    * storage/IO ahead of any ANN stage (the embedding column dominates scan
    * cost at 100 TB; int8 is the standard first compression rung below
    * PQ). Appends `(scale double, codes array<byte>)`; reconstruct with
    * [[dequantizeInt8]]. Map-side codegen'd kernels, no shuffle; codes are
    * floor(v/scale + 0.5) — IEEE ops that any engine replays bit-for-bit,
    * so the gate is hash-checked against DuckDB, not rows-only.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    import graft.functions.GraftExpressions.{int8_codes, int8_scale}
    df.withColumn("scale", int8_scale(col(vecCol)))
      .withColumn("codes", int8_codes(col(vecCol)))
  }

  /** Reconstruction: codes × scale as float — feed to the exact-cosine
    * kernels for compressed-domain scoring (fidelity pinned in spec).
    */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    transform(codes, c => (c.cast("double") * scale).cast("float"))

  /** Compressed-domain ANN: candidate ranking runs ENTIRELY on int8 codes
    * (per-vector scales cancel in cosine, so the ranking needs only exact
    * integer dot products over data that is 4× smaller on disk and in the
    * scan — the cost that dominates a 100 TB brute-force pass), then the
    * top `k × refineFactor` candidates per query are re-scored with exact
    * float cosine and cut to k. Same bounded-heap partial aggregation as
    * every rung of the ANN ladder: the shuffle moves O(queries × k ×
    * refineFactor × partitions) rows, never the corpus. Approximate only
    * at the candidate boundary — int8 ranking error can push a true
    * neighbor below the refine cut; recall is spec-pinned.
    */
  def int8TopK(data: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int,
      refineFactor: Int = 4): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1, got $refineFactor")
    val d = quantizeInt8(Dedup.widen(data), vecCol)
      .select(col(idCol), col(vecCol), col("codes"),
        int8_dot(col("codes"), col("codes")).alias("_self"))
      .where(col("_self") > 0) // zero vectors have no cosine direction
    val q = broadcast(quantizeInt8(queries, vecCol)
      .select(col(queryIdCol).alias("query_id"),
        col("codes").alias("_qcodes"),
        int8_dot(col("codes"), col("codes")).alias("_qself"))
      .where(col("_qself") > 0))
    val approx = d.join(q, col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).alias("neighbor_id"),
        (int8_dot(col("codes"), col("_qcodes")).cast("double") /
          sqrt(col("_self").cast("double") * col("_qself").cast("double")))
          .alias("cosine"))
    val cands = topKPerQuery(approx, k * refineFactor)
      .select(col("query_id"), col("neighbor_id"))
    // exact refine: only the candidate rows rejoin the float vectors; the
    // candidate table is queries × k × refineFactor rows — broadcast side
    val qv = broadcast(queries.select(col(queryIdCol).alias("query_id"),
      col(vecCol).alias("_qvec")))
    val rescored = data.select(col(idCol).alias("neighbor_id"), col(vecCol))
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col(vecCol), col("_qvec")).alias("cosine"))
    topKPerQuery(rescored, k)
  }

  def centroids(df: DataFrame, vecCol: String, byCols: Seq[String]): DataFrame =
    df.select(byCols.map(col) :+ posexplode(col(vecCol)): _*)
      .groupBy(byCols.map(col) :+ col("pos"): _*)
      .agg((sum(col("col").cast(org.apache.spark.sql.types.DecimalType(27, 10)))
        .cast("double") / count(lit(1))).alias("centroid_v"))
      .withColumnRenamed("pos", "dim")

  /** Recall@k of an ANN result against the exact baseline (test metric). */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select("query_id", "neighbor_id")
    val a = approx.select("query_id", "neighbor_id")
    val hit = e.join(a, Seq("query_id", "neighbor_id"), "left_semi").count()
    val total = e.count()
    if (total == 0) 0.0 else hit.toDouble / total
  }
}
