package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.where($"vec_id" < 5)
    .select($"vec_id".alias("query_id"), $"embedding")

  test("bruteForceTopK returns k ranked neighbors per query, no self-match") {
    val got = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 10)
    val counts = got.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 5 && counts.values.forall(_ == 10))
    assert(got.where($"neighbor_id" === $"query_id").count() == 0)
    // ranks are 1..10 with descending cosine
    val r = got.where($"query_id" === 0).orderBy("rank")
      .select("cosine").as[Double].collect()
    assert(r.length == 10 && r.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("bruteForceTopK matches a window-rank reference implementation") {
    import graft.functions.GraftExpressions.cosine_sim
    val q = broadcast(queries.select($"query_id", $"embedding".alias("_qv")))
    val ref = emb.join(q, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".alias("neighbor_id"),
        cosine_sim($"embedding", $"_qv").alias("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"cosine".desc, $"neighbor_id")))
      .where($"rank" <= 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "query_id", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("lshTopK recall vs exact baseline is reasonable at small plane count") {
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5)
    val approx = Similarity.lshTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, dim = 64, numPlanes = 4)
    val recall = Similarity.recallAtK(exact, approx)
    // 4 planes → 16 buckets over 500 vecs; multi-probe widens to 5 buckets
    // per query. Must beat random chance (1%) by a wide margin.
    assert(recall > 0.3, s"recall=$recall")
    val singleProbe = Similarity.lshTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, dim = 64, numPlanes = 4,
      multiProbe = false)
    assert(recall >= Similarity.recallAtK(exact, singleProbe))
  }

  test("pqTopK: ADC + exact refine recovers most of the exact top-k; deterministic") {
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5)
    val pq = Similarity.pqTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, dim = 64, m = 8, ksub = 256,
      refine = 8)
    val recall = Similarity.recallAtK(exact, pq)
    // standard PQ8x256 (8 bytes/vector); the refine pass re-scores top-40
    // candidates exactly, so misses only occur when the true neighbor
    // falls outside the ADC top-40. The synthetic corpus is near-random —
    // PQ's worst case — so this bound is conservative for real embeddings.
    assert(recall >= 0.7, s"recall=$recall")
    // refined scores ARE exact cosines: every reported (pair, cosine)
    // agrees with the brute-force score for that pair
    val ex = exact.select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val rep = pq.select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    rep.foreach { case (q, n, c) =>
      ex.get((q, n)).foreach(e => assert(e == c, s"($q,$n): $c vs $e"))
    }
    // deterministic end to end (fixed sample order, fixed iterations)
    val again = Similarity.pqTopK(emb, queries,
        "vec_id", "embedding", "query_id", k = 5, dim = 64, m = 8, ksub = 256,
        refine = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(again == pq.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet)
  }

  test("ivfPqTopK: coarse prune + code scan + refine; full probe matches PQ alone") {
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5)
    val partial = Similarity.ivfPqTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, dim = 64,
      numCells = 8, nprobe = 6, refine = 8)
    val rPartial = Similarity.recallAtK(exact, partial)
    // near-random corpus: neighbors spread across cells, so 6-of-8 probing
    // bounds recall near nprobe/numCells × PQ's own recall — chance is 1%
    assert(rPartial >= 0.4, s"recall=$rPartial")
    // probing every cell must recover (at least) plain PQ's recall: the
    // cell stage then prunes nothing
    val full = Similarity.ivfPqTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, dim = 64,
      numCells = 8, nprobe = 8, refine = 8)
    val pq = Similarity.pqTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, dim = 64, refine = 8)
    assert(Similarity.recallAtK(exact, full) >=
      Similarity.recallAtK(exact, pq) - 1e-9)
    assert(Similarity.recallAtK(exact, full) >= rPartial - 1e-9)
  }

  test("brute force plan broadcasts queries (no full shuffle of corpus)") {
    val plan = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("ivfTopK: full probe equals exact; partial probe keeps most recall") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q3 = real.where(col("vec_id") < 3)
      .select(col("vec_id").alias("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(real, q3, "vec_id", "embedding",
      "query_id", k = 10)
    // probing EVERY cell must reproduce the exact result
    val full = Similarity.ivfTopK(real, q3, "vec_id", "embedding",
      "query_id", k = 10, numCells = 8, nprobe = 8)
    assert(Similarity.recallAtK(exact, full) == 1.0)
    // a partial probe keeps useful recall at ~3/8 of the scan volume
    val partial = Similarity.ivfTopK(real, q3, "vec_id", "embedding",
      "query_id", k = 10, numCells = 8, nprobe = 3)
    assert(Similarity.recallAtK(exact, partial) >= 0.4)
  }

  test("int8 quantization: codes bounded, zero-vector safe, high cosine fidelity") {
    val q = Similarity.quantizeInt8(emb, "embedding")
    // codes live in [-127, 127] and the max-|v| dim hits ±127 exactly
    val bounds = q.select(explode($"codes").alias("c"))
      .agg(min($"c"), max($"c")).head()
    assert(bounds.getByte(0) >= -127 && bounds.getByte(1) <= 127)
    assert(bounds.getByte(0) == -127 || bounds.getByte(1) == 127)
    // reconstruction fidelity: cosine(dequantized, original) ≥ 0.999 for
    // every vector — int8 is lossy in magnitude, not direction
    import graft.functions.GraftExpressions.cosine_sim
    val worst = q.select(cosine_sim(
        Similarity.dequantizeInt8($"codes", $"scale"), $"embedding")
      .alias("cos")).agg(min($"cos")).head().getDouble(0)
    assert(worst >= 0.999, s"worst reconstruction cosine $worst")
    // zero vector: scale 0, all codes 0 (no division, no NaN)
    val z = Similarity.quantizeInt8(
      Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding"), "embedding")
      .select($"scale", $"codes").head()
    assert(z.getDouble(0) == 0.0)
    assert(z.getSeq[Byte](1).forall(_ == 0))
  }

  test("int8TopK: compressed-domain candidates + exact refine keep high recall") {
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
      "query_id", k = 10)
    val got = Similarity.int8TopK(emb, queries, "vec_id", "embedding",
      "query_id", k = 10, refineFactor = 4)
    val r = Similarity.recallAtK(exact, got)
    assert(r >= 0.95, s"int8 recall@10 = $r")
    // refined scores are EXACT float cosines: every returned (query,
    // neighbor) pair's cosine equals the brute-force value
    val g = got.select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val e = exact.select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    g.foreach { case (key, cos) =>
      e.get(key).foreach(ec => assert(ec == cos, s"$key: $cos vs $ec")) }
    // determinism
    val again = Similarity.int8TopK(emb, queries, "vec_id", "embedding",
      "query_id", k = 10, refineFactor = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(again == got.as[(Long, Long, Double, Int)].collect().toSet)
  }

  test("centroids: exact per-group mean, order-independent under repartition") {
    val vecs = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 6.0f)),
      ("b", Array(10.0f, 0.0f))
    ).toDF("grp", "vec")
    val got = Similarity.centroids(vecs, "vec", Seq("grp"))
      .as[(String, Int, Double)].collect().toSet
    assert(got == Set(("a", 0, 2.0), ("a", 1, 4.0), ("b", 0, 10.0), ("b", 1, 0.0)))
    // the decimal accumulation makes the sum independent of partitioning
    val shuffled = Similarity.centroids(vecs.repartition(5), "vec", Seq("grp"))
      .as[(String, Int, Double)].collect().toSet
    assert(shuffled == got)
    // partial aggregation: the explode never reaches the exchange unreduced
    val plan = Similarity.centroids(vecs, "vec", Seq("grp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan)
  }
}
