package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.GraftExpressions.cosine_sim_d

/** Deterministic distributed spherical k-means (Lloyd's iteration with
  * cosine assignment) over an embedding column — the exact, full-data
  * counterpart of the sampled MLlib fit the IVF index uses for its coarse
  * quantizer ([[Similarity.ivfTopK]]). Spherical (max-cosine) assignment is
  * the standard variant for text/LLM embeddings, where direction carries
  * the signal and magnitude is noise; it is also what makes the operator
  * end-to-end REPRODUCIBLE: the cosine kernel's fixed-order double
  * accumulation matches DuckDB's `list_cosine_similarity` bit-for-bit, so
  * every iteration is oracle-checkable (the `q_kmeans` gate unrolls the
  * same iterations in SQL), which L2 distance would only give up to an
  * accumulation-order guess.
  *
  * Determinism contract (cluster ≡ local bit-for-bit):
  *  - init: the k lowest-id vectors (a bounded TakeOrdered, no RNG);
  *  - assignment: `argmax_cell cosine(x, c_cell)`, ties to the LOWEST cell
  *    id (first occurrence of the max in cell order);
  *  - update: per-dimension mean with exact DECIMAL(27,10) summation (the
  *    [[Similarity.centroids]] trick) — order-independent, so executor
  *    count and partial-aggregation order cannot perturb the result.
  *
  * Scale shape: each iteration is one map-side assignment pass (k codegen'd
  * kernel calls per row against broadcast-literal centroids — no join, no
  * shuffle) plus ONE aggregation shuffle of |k × dim| keys after map-side
  * partials; the k×dim centroid matrix (bounded, e.g. 8×64 doubles) is
  * collected to the driver between iterations exactly like any iterative
  * ML driver loop. Nothing grows with row count except the scans.
  */
object KMeans {
  /** Exact per-dim decimal mean, cast to double — must stay in lockstep
    * with the oracle SQL (`CAST(sum(CAST(e AS DECIMAL(27,10))) AS DOUBLE)
    * / count(*)`).
    */
  private def meanCol(v: Column): Column =
    (sum(v.cast(DecimalType(27, 10))).cast(DoubleType) / count(lit(1)))

  /** One assignment pass: adds `cell` (int, argmax cosine, ties low) and
    * `_cos` against the given centroid matrix. Pure projection.
    */
  private def withCell(df: DataFrame, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    val vecD = col(vecCol).cast("array<double>")
    val cos = array(centroids.map(c => cosine_sim_d(vecD, typedLit(c))): _*)
    df.withColumn("_cos_all", cos)
      .withColumn("_cos", array_max(col("_cos_all")))
      // array_position returns the FIRST index of the max → lowest cell id
      .withColumn("cell",
        (array_position(col("_cos_all"), col("_cos")) - 1).cast("int"))
      .drop("_cos_all")
  }

  /** Recompute centroids as exact per-dim means of their members. Cells
    * with no members drop out (the caller keeps the previous centroid).
    */
  private def updateCentroids(assigned: DataFrame, vecCol: String)
      : Map[Int, Seq[Double]] =
    assigned
      // posexplode the RAW float elements: the decimal cast must see the
      // same input as the oracle's `CAST(e AS DECIMAL(27,10))` over an
      // unnested FLOAT (the [[Similarity.centroids]]-proven chain); a
      // float→double pre-cast would round-trip differently
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("_dim", "_v")))
      .groupBy(col("cell"), col("_dim"))
      .agg(meanCol(col("_v")).alias("_m"))
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("_dim"), col("_m"))))
        .alias("_c"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)))
      .toMap

  /** Fit: returns the centroid matrix after `iters` Lloyd's iterations,
    * row index = cell id. Init = the k lowest-id vectors.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Seq[Seq[Double]] = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val init = df.select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(k) // TakeOrderedAndProject: bounded by k
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    require(init.size == k, s"need >= $k rows to seed, got ${init.size}")
    (0 until iters).foldLeft(init) { case (cen, _) =>
      val updated = updateCentroids(withCell(df, vecCol, cen), vecCol)
      cen.indices.map(i => updated.getOrElse(i, cen(i)))
    }
  }

  /** Assign every row to its nearest (max-cosine) centroid: adds `cell`
    * and the winning `_cos` renamed to `cosine`.
    */
  def assign(df: DataFrame, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame =
    withCell(df, vecCol, centroids).withColumnRenamed("_cos", "cosine")
}
