package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Decontaminate, Dedup, KMeans, Overlap, Sampling,
  Shards, Similarity, Splits}

/** The LLM-data-curation surface in one flowing scenario over the real
  * corpus: corpus-frequency boilerplate removal → quality/repetition/
  * compressibility filter → exact keep-best dedup → near-dup keep-one →
  * bloom-prefiltered benchmark decontamination → token-budget
  * per-language mixing → train/val/test split → token-budget sharding →
  * survivor embedding clustering (exact spherical k-means).
  * Each stage is unit- and oracle-tested elsewhere; this pins that they
  * COMPOSE — schemas line up, counts shrink monotonically, and the whole
  * pipeline is deterministic end to end.
  */
class CurationTourSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private val TourBowWeights: Seq[Int] =
    (0 until 256).map(i =>
      (graft.functions.SketchOps.splitmix64(31L + i) % 1000L).toInt)

  /** Stage 0 (r9): corpus-frequency boilerplate removal — ultra-frequent
    * whitespace segments cut from every doc before anything scores them.
    * Shared by the pipeline and the test's decontamination assertion so
    * both sides see the same text.
    */
  private def cleanedDocs(): DataFrame = {
    val raw = Tables.load(spark, sf, "documents")
    Dedup.dropFrequentLines(raw, "doc_id", "text", minCount = 975, sep = " ")
      .join(raw.select("doc_id", "lang"), Seq("doc_id"))
      .withColumnRenamed("text_clean", "text")
  }

  private def pipeline(): DataFrame = {
    val docs = cleanedDocs()
    // 1. score + filter: drop low-quality, boilerplate-repetitive, and
    // pathologically-compressible (r9 deflate gate) docs
    val filtered = docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("rep2", TextAnalysis.topNgramFraction(col("text"), 2))
      .withColumn("ntoks", TextAnalysis.tokenCount(col("text")))
      .withColumn("deflate",
        graft.functions.GraftExpressions.deflate_ratio(col("text")))
      // r9b: the learned-classifier shape rides the same projection (a
      // permissive threshold — the stand-in weights are zero-mean noise,
      // the point is the composed plan, not the cut)
      .withColumn("bow", graft.functions.GraftExpressions.hashed_bow_score(
        col("text"), TourBowWeights))
      .where(col("quality") > 0.5 && col("rep2") < 0.5 &&
        col("deflate") > 0.2 && col("bow") > -0.5)
    // 2a. EXACT dedup keeping the best-quality copy (r8) — runs before the
    // near-dup machinery so identical reformats resolve by quality
    val bestIds = Dedup.keepBest(filtered, "doc_id", "text", col("quality"))
      .select(col("keep_id").alias("doc_id"))
    val exactDeduped = filtered.join(bestIds, Seq("doc_id"), "left_semi")
    // 2b. near-dup keep-one (MinHash → connected components → min-id)
    val pairs = Dedup.minhashNearDups(exactDeduped, "doc_id", "text", threshold = 0.5)
    val losers = Dedup.connectedComponents(pairs)
      .where(col("id") =!= col("component"))
      .select(col("id").alias("doc_id"))
    val deduped = exactDeduped.join(losers, Seq("doc_id"), "left_anti")
    // 3. decontaminate vs a small held-out "benchmark" slice — through the
    // BLOOM prefilter path (r8; output identical to exact by construction)
    val bench = docs.where(col("doc_id") % 97 === 0).select("doc_id", "text")
    val dirty = Decontaminate.overlapBloom(deduped, bench, "doc_id", "text",
      n = 8, minShared = 1L).select("doc_id")
    val clean = deduped.join(dirty, Seq("doc_id"), "left_anti")
    // 4. token-budget mixing per language (r8), 5. split deal,
    // 6. token-budget shards
    val langTotals = clean.groupBy("lang").agg(sum("ntoks").as("t"))
      .as[(String, Long)].collect().toMap
    val mixed = Sampling.mixByBudget(clean, "doc_id", "lang", "ntoks",
      budgets = Map("en" -> langTotals.getOrElse("en", 1L) * 9 / 10),
      defaultRate = 0.7, seed = 5L)
    val split = Splits.assign(mixed, "doc_id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    Shards.assignByTokenBudget(split, "doc_id", "ntoks", budget = 4000L)
  }

  test("filter → dedup → decontaminate → mix → split → shard composes") {
    val docs = cleanedDocs()
    val out = pipeline().cache()
    try {
      val total = docs.count()
      val n = out.count()
      // every stage only removes rows; the pipeline keeps a real subset
      assert(n > 0 && n < total, s"$n of $total")
      // dedup really happened: no two surviving SHINGLEABLE docs share
      // identical text (MinHash shingles are CHARACTER 5-grams, so docs
      // shorter than 5 chars are outside its pairing contract)
      val shingleable = out.where(length(col("text")) >= 5)
      assert(shingleable.select("text").distinct().count() == shingleable.count())
      // decontamination really happened: no survivor shares an 8-gram
      // with the benchmark slice
      val bench = docs.where(col("doc_id") % 97 === 0).select("doc_id", "text")
      assert(Decontaminate.overlap(out, bench, "doc_id", "text",
        n = 8, minShared = 1L).count() == 0)
      // every row carries the full curation envelope
      val cols = out.columns.toSet
      assert(Set("doc_id", "quality", "rep2", "split", "shard").subsetOf(cols), cols)
      // the split deal covers all three names and roughly its 8/1/1 weights
      val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
      assert(bySplit.keySet == Set("train", "val", "test"), bySplit.toString)
      assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
      // shards are dense 0..max and respect the token budget layout
      val shards = out.groupBy("shard")
        .agg(sum(col("ntoks")).as("toks")).as[(Long, Long)].collect()
      assert(shards.map(_._1).sorted.toSeq == (0L to shards.map(_._1).max).toSeq)
      // r9: the curation envelope composes with the similarity surface —
      // cluster the SURVIVORS' embeddings with the exact spherical k-means
      val emb = Tables.load(spark, sf, "embeddings")
      val survivorVecs = emb.join(
        out.select(col("doc_id").alias("vec_id")), Seq("vec_id"), "left_semi")
      val cen = KMeans.fit(survivorVecs, "vec_id", "embedding", k = 4, iters = 1)
      val cells = KMeans.assign(survivorVecs, "embedding", cen)
      assert(cells.count() == survivorVecs.count())
      assert(cells.select("cell").distinct().count() <= 4)
      // r9 (cont.): the corpus-overlap diagnostic agrees with the
      // per-document decontamination — zero benchmark 8-grams survive in
      // the curated corpus, while the raw corpus (a superset of the
      // benchmark slice) shares plenty
      val rawOv = Overlap.ngramOverlap(docs, bench, "text", n = 8).head()
      val outOv = Overlap.ngramOverlap(out, bench, "text", n = 8).head()
      assert(rawOv.getLong(2) > 0L)
      assert(outOv.getLong(2) == 0L, s"curated corpus still shares grams: $outOv")
      // r9 (cont.): survivors' embeddings int8-quantize with the fidelity
      // the ANN stage needs (4x smaller index input)
      val q8 = Similarity.quantizeInt8(survivorVecs, "embedding")
      val worstCos = q8.select(graft.functions.GraftExpressions.cosine_sim(
          Similarity.dequantizeInt8(col("codes"), col("scale")),
          col("embedding")).as("c"))
        .agg(min(col("c"))).head().getDouble(0)
      assert(worstCos >= 0.999, s"int8 fidelity $worstCos")
      // r9b: the span-level packing manifest tiles the curated corpus into
      // exact-length sequences — every interior sequence holds exactly the
      // budget, and spans reassemble each doc completely
      val spans = Shards.packSpans(out, "doc_id", "ntoks", budget = 512L)
        .select($"doc_id", $"seq", $"tok_start", $"tok_end")
        .as[(Long, Long, Long, Long)].collect()
      val perSeq = spans.groupBy(_._2).map { case (s, ss) =>
        s -> ss.map(x => x._4 - x._3).sum }
      val lastSeq = perSeq.keys.max
      assert(perSeq.filter(_._1 != lastSeq).values.forall(_ == 512L))
      val spanToks = spans.map(x => x._4 - x._3).sum
      val outToks = out.agg(sum(when(col("ntoks") > 0, col("ntoks"))
        .otherwise(0L))).head().getLong(0)
      assert(spanToks === outToks)
      // r9b: the persisted ANN index serves the survivors — a probe with a
      // survivor's own vector under a fresh id retrieves it at rank 1
      val ixDir = java.nio.file.Files.createTempDirectory("graft-tourix")
        .resolve("ix").toString
      graft.operators.AnnIndex.buildIvf(ixDir, survivorVecs, "vec_id",
        "embedding", numCells = 4, fitSampleSize = 1000)
      val probe = survivorVecs.orderBy($"vec_id").limit(1)
        .select(($"vec_id" + 900000L).alias("qid"), $"embedding")
      val hit = graft.operators.AnnIndex
        .searchIvf(ixDir, probe, "qid", k = 1, nprobe = 4)
        .head()
      assert(hit.getLong(1) ===
        survivorVecs.orderBy($"vec_id").limit(1).head().getLong(0))
      assert(hit.getDouble(2) > 0.999999)
      // determinism: the whole pipeline reruns to the identical row set
      val again = pipeline().select("doc_id", "split", "shard")
        .as[(Long, String, Long)].collect().toSet
      val first = out.select("doc_id", "split", "shard")
        .as[(Long, String, Long)].collect().toSet
      assert(again == first)
    } finally out.unpersist()
  }
}
