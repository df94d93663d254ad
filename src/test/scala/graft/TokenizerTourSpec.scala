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

  test("pretrain manifest: the six-stage chain emits spans that reassemble every sequence and every document exactly") {
    import graft.functions.TextAnalysis
    import graft.operators.{Dedup, Sampling, Shards, TokenizerStore}
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("doc_id", col("doc_id").cast("long"))
    // stages 1-2: curation gate + exact dedup (the q_pretrain_manifest
    // chain at sf0.001 — the gate's DuckDB oracle hash-verifies values;
    // this spec pins the STRUCTURAL invariants a training loader relies
    // on, which no row-hash can express)
    val gated = Dedup.widen(docs).select(col("doc_id"), col("text"))
      .where(TextAnalysis.langScore(col("text"), "en") > 0.05 &&
        TextAnalysis.tokenCount(col("text")).cast("double") >= 20)
    val keep = gated.groupBy(col("text"))
      .agg(min(col("doc_id")).alias("doc_id")).select(col("doc_id"))
    val corpus = gated.join(keep, Seq("doc_id")).localCheckpoint(true)
    try {
      val nDocs = corpus.count()
      assert(nDocs > 0, "curation+dedup left an empty corpus — the " +
        "fixture no longer exercises the chain")
      // stages 3-4: train in the chain, round-trip the artifact, serve
      val work = java.nio.file.Files.createTempDirectory("graft-pretraintour")
      val served = try {
        val model = UnigramLm.train(corpus, "text", vocabSize = 200,
          maxPieceLen = 3, seedSize = 40, emIters = 1, pruneFraction = 0.0)
        val path = work.resolve("tok").toString
        TokenizerStore.saveUnigram(path, model, spark)
        val loaded = TokenizerStore.loadUnigram(spark, path)
        assert(loaded == model, "store round trip altered the model")
        loaded
      } finally graft.util.Fs.rmTree(work.toFile)
      val toks = UnigramLm.tokenCounts(corpus, "doc_id", "text", served)
        .select(col("doc_id"), col("n_tokens").alias("n_tok"))
      // stages 5-6: shuffle + span packing
      val budget = 512L
      val manifest = Shards.packSpans(
          Sampling.shuffled(toks, "doc_id", seed = 11L),
          "shuffle_pos", "n_tok", budget)
        .localCheckpoint(true)

      // shuffle_pos is a permutation of 0..nDocs-1
      val pos = manifest.select("doc_id", "shuffle_pos").distinct()
      assert(pos.count() == nDocs)
      assert(pos.agg(min("shuffle_pos"), max("shuffle_pos"),
        countDistinct("shuffle_pos")).head() match {
        case r => r.getLong(0) == 0L && r.getLong(1) == nDocs - 1 &&
          r.getLong(2) == nDocs
      })

      // per document: its slices tile [0, n_tok) without gap or overlap
      // (slices are ordered by seq; each starts where the previous ended)
      val perDoc = manifest.groupBy("doc_id")
        .agg(min("tok_start").alias("lo"), max("tok_end").alias("hi"),
          sum(col("tok_end") - col("tok_start")).alias("covered"),
          first("n_tok").alias("n_tok"))
      assert(perDoc.where(col("lo") =!= 0L || col("hi") =!= col("n_tok") ||
        col("covered") =!= col("n_tok")).count() == 0,
        "some document's slices do not tile its token range")

      // per sequence: every sequence except the last holds exactly
      // `budget` tokens, tiled contiguously from offset 0
      val totalToks = toks.agg(sum("n_tok")).head().getLong(0)
      val lastSeq = (totalToks - 1) / budget
      val perSeq = manifest.groupBy("seq")
        .agg(sum(col("tok_end") - col("tok_start")).alias("filled"),
          min("seq_offset").alias("first_off"),
          max(col("seq_offset") + col("tok_end") - col("tok_start"))
            .alias("end_off"))
      assert(perSeq.where(col("seq") =!= lastSeq &&
        (col("filled") =!= budget || col("first_off") =!= 0L ||
          col("end_off") =!= budget)).count() == 0,
        "a non-final sequence is not exactly budget tokens tiled from 0")
      assert(perSeq.where(col("seq") === lastSeq).head() match {
        case r => r.getLong(1) == totalToks - lastSeq * budget &&
          r.getLong(2) == 0L
      })
    } finally corpus.unpersist()
  }
}
