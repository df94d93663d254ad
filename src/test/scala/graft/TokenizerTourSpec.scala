package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeTrain, UnigramLm, WordPieceTrain}

/** The tokenizer surface in one flowing scenario over the real corpus:
  * ONE word-count pass feeds all THREE trainers (frequency-argmax BPE,
  * likelihood-argmax WordPiece, hard-EM unigram), every trained artifact
  * serves the same documents, and the cross-family invariants hold —
  * each algorithm compresses the corpus below its character count, the
  * three produce genuinely different vocabularies/segmentations on this
  * corpus, and serving totals are deterministic. Each trainer is unit-
  * and oracle-tested elsewhere; this pins that they COMPOSE off one
  * shared corpus pass, the way a real pipeline would train candidates
  * side by side.
  */
class TokenizerTourSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("one word-count pass trains all three tokenizer families") {
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id").cast("long"))
    val counts = BpeTrain.wordCounts(docs, "text").localCheckpoint(true)
    try {
      val nChars = docs.select(
        sum(length(regexp_replace(col("text"), "\\s+", ""))).cast("long"))
        .head().getLong(0)

      // BPE and WordPiece: same loop, different argmax — on this corpus
      // the learned tables must diverge (likelihood favors cohesive rare
      // pairs; the spec-level hand trace pins the mechanism, this pins
      // it holds on real data)
      val bpe = BpeTrain.trainFromCounts(counts, numMerges = 8)
        .orderBy("rank").select("l", "r")
        .as[(String, String)].collect().toSeq
      val wp = WordPieceTrain.trainFromCounts(counts, numMerges = 8)
        .orderBy("rank").select("l", "r")
        .as[(String, String)].collect().toSeq
      assert(bpe != wp, "frequency and likelihood argmax agreed on all 8 " +
        "merges — the corpus no longer discriminates the trainers")

      // unigram: seed + 2 EM iterations off the same counts table
      val uni = {
        val seed = UnigramLm.seedVocab(counts, maxPieceLen = 3, seedSize = 40)
          .as[(String, Long)].collect().toSeq
        val est = UnigramLm.emStep(counts, seed)
          .as[(String, Long)].collect().toMap
        seed.filter(p => p._1.length == 1 || est.contains(p._1))
          .map { case (p, c) =>
            (p, if (p.length == 1) math.max(est.getOrElse(p, 0L), 1L)
            else est(p))
          }
      }

      // every family serves the same documents and compresses
      val nBpe = BpeTrain.tokenCounts(docs, "doc_id", "text", bpe)
        .select(sum(col("n_tokens"))).head().getLong(0)
      val nWp = BpeTrain.tokenCounts(docs, "doc_id", "text", wp)
        .select(sum(col("n_tokens"))).head().getLong(0)
      val nUni = UnigramLm.tokenCounts(docs, "doc_id", "text", uni)
        .select(sum(col("n_tokens"))).head().getLong(0)
      assert(nBpe < nChars && nWp < nChars && nUni < nChars,
        s"some family failed to compress: bpe=$nBpe wp=$nWp uni=$nUni " +
          s"chars=$nChars")

      // regularized serving stays within the n-best envelope: the
      // corpus-total sampled token count lands between the sums of each
      // occurrence's smallest and largest candidate counts
      val ns = UnigramLm.sampleTokenCounts(docs, "doc_id", "text",
          uni, nBest = 4, alpha = 0.3, seed = 5L)
        .select(sum(col("n_tokens"))).head().getLong(0)
      val occ = docs.select(explode(filter(split(col("text"), "\\s+"),
        w => length(w) > 0)).alias("word"))
      val bounds = occ
        .join(broadcast(UnigramLm.segmentWordsNBest(occ, uni, nBest = 4)
          .select(col("word"),
            aggregate(col("cands"), lit(Long.MaxValue),
              (a, c) => least(a, c.getField("ntok"))).alias("lo"),
            aggregate(col("cands"), lit(0L),
              (a, c) => greatest(a, c.getField("ntok"))).alias("hi"))),
          Seq("word"))
        .select(sum(col("lo")).alias("lo"), sum(col("hi")).alias("hi"))
        .head()
      assert(ns >= bounds.getLong(0) && ns <= bounds.getLong(1),
        s"sampled total $ns outside the n-best envelope " +
          s"[${bounds.getLong(0)}, ${bounds.getLong(1)}]")

      // and the whole tour is deterministic end to end
      val nBpe2 = BpeTrain.tokenCounts(docs, "doc_id", "text", bpe)
        .select(sum(col("n_tokens"))).head().getLong(0)
      assert(nBpe2 == nBpe)
    } finally counts.unpersist()
  }
}
