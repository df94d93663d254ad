package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** BM25 ranking ("Okapi BM25", Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond") — the standard
  * lexical retrieval score, used in training-data pipelines both to mine
  * query-relevant subsets and as the sparse half of hybrid (BM25 + dense)
  * retrieval next to [[Similarity]]'s ANN ladder.
  *
  * Two surfaces:
  *   - [[bm25Index]] — the indexing pass: the full (doc, term) weight
  *     table plus its corpus statistics, the thing a retrieval system
  *     precomputes once per corpus snapshot.
  *   - [[bm25Search]] — the query pass: top-k documents for a bag-of-words
  *     query. Everything term-dependent is filtered to the query's terms
  *     BEFORE any aggregation, so the per-query cost is proportional to
  *     the query terms' postings, not the vocabulary.
  *
  * Scale shape: token explode is O(total tokens) rows; tf and df are
  * partial-aggregating groupBys on (doc, term) / term; doc length comes
  * from re-aggregating the tf table (no second corpus scan); N and avgdl
  * are one broadcast scalar row. The idf variant is Lucene's
  * ln(1 + (N − df + ½)/(df + ½)) — strictly positive, so a stop-word that
  * appears everywhere scores near zero instead of flipping sign. Scoring
  * is pure column arithmetic on the joined table; the search top-k is an
  * `orderBy(...).limit(k)` → TakeOrderedAndProject (per-partition heaps,
  * no global sort). Nothing here collects to the driver.
  */
object Retrieval {

  /** Tokens exploded to one row per occurrence: (idCol, term). */
  private def postings(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
        .alias("term"))
      .where(length(col("term")) > 0)

  /** Full (doc, term) BM25 weight table:
    * (idCol, term, tf, df, dl, bm25) — term frequency in the doc, document
    * frequency across the corpus, doc length in tokens, and the BM25
    * weight. `k1` saturates tf; `b` scales the length normalization.
    */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = postings(docs, idCol, textCol)
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).alias("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).alias("dl"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).alias("df")) // tf rows are distinct (doc, term)
    val stats = dl.agg(count(lit(1)).alias("n_docs"),
      avg(col("dl").cast(DoubleType)).alias("avgdl"))
    score(tf.join(dl, Seq(idCol)).join(df, Seq("term"))
      .crossJoin(broadcast(stats)), k1, b)
  }

  /** Top-k documents for a bag-of-words `query`.
    *
    * Corpus-level statistics (N, avgdl, per-doc length) cover the WHOLE
    * corpus — they are query-independent and in a deployed system come
    * from the [[bm25Index]] pass — but tf and df aggregate only rows whose
    * term is in the query (an `isin` filter that reaches the scan).
    * Ties break on ascending doc id, so the result is deterministic.
    */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k > 0, s"k must be positive, got $k")
    val toks = postings(docs, idCol, textCol)
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).alias("dl"))
    val stats = dl.agg(count(lit(1)).alias("n_docs"),
      avg(col("dl").cast(DoubleType)).alias("avgdl"))
    val qtoks = toks.where(col("term").isin(query.distinct: _*))
    val tf = qtoks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).alias("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).alias("df"))
    score(tf.join(dl, Seq(idCol)).join(broadcast(df), Seq("term"))
        .crossJoin(broadcast(stats)), k1, b)
      .groupBy(col(idCol)).agg(sum(col("bm25")).alias("score"),
        count(lit(1)).alias("n_terms"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard way to combine BM25's lexical ranking with an ANN dense
    * ranking into one hybrid result: each list contributes
    * `1 / (kConst + rank)` per document, documents missing from a list
    * contribute nothing, and the fused order is the contribution sum.
    * Rank-based (not score-based), so the two lists need no score
    * calibration against each other — the whole reason RRF won out in
    * practice.
    *
    * Scale shape: inputs are already top-N lists (bounded), so this is
    * arithmetic over k·lists rows — one union, one partial-aggregating
    * groupBy, a TakeOrderedAndProject for the final top-k, and a window
    * over ≤ topK rows (bounded, never the corpus) to materialize the
    * fused rank. The per-id fold runs in FIXED source order
    * (array_sort over (source, rank) structs): double addition is
    * order-sensitive beyond two addends, and a nondeterministic sum order
    * would make the fusion unreproducible across runs/engines.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      topK: Int, kConst: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(topK > 0 && kConst > 0, "topK and kConst must be positive")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol),
        col(rankCol).cast(org.apache.spark.sql.types.LongType).alias("_r"),
        lit(i).alias("_src"))
    }
    val fused = tagged.reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(count(lit(1)).alias("n_lists"),
        aggregate(
          array_sort(collect_list(struct(col("_src"), col("_r")))),
          lit(0.0),
          (acc, x) => acc + lit(1.0) /
            (lit(kConst.toDouble) + x.getField("_r").cast(DoubleType)))
          .alias("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topK)
    fused.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("rrf").desc, col(idCol).asc)))
  }

  /** BM25 weight from joined (tf, df, dl, n_docs, avgdl) columns. */
  private def score(joined: DataFrame, k1: Double, b: Double): DataFrame = {
    val idf = log(lit(1.0) +
      (col("n_docs").cast(DoubleType) - col("df").cast(DoubleType) + lit(0.5)) /
        (col("df").cast(DoubleType) + lit(0.5)))
    val tfD = col("tf").cast(DoubleType)
    val norm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("dl").cast(DoubleType) / col("avgdl"))
    joined.withColumn("bm25", idf * tfD * lit(k1 + 1.0) / (tfD + norm))
      .drop("n_docs", "avgdl")
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998) —
    * the diversity step between retrieval and consumption: from each
    * query's candidate set, greedily select `m` items maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)`; the first pick is
    * pure relevance. Ties break by candidate id ascending, so the
    * selection is deterministic.
    *
    * Distributed as `m` unrolled DataFrame steps (per step: an anti-join
    * drops the already-selected, a join+max computes each survivor's
    * similarity to the selected set, a per-query row_number picks the
    * winner) — every step is joins and per-query-bounded windows, so the
    * operator scales over MILLIONS of queries at once; per-query work is
    * O(m·|candidates|) pairwise cosines, the caller bounds |candidates|
    * (a retrieval top-N). No per-group driver logic, no global window.
    *
    * @param candidates (queryIdCol, idCol, relCol, vecCol) — one row per
    *   query×candidate, e.g. a [[Similarity.bruteForceTopK]] / ANN top-N
    *   joined back to its vectors
    * @return (query_id, neighbor_id, mmr_rank, mmr_score) — `mmr_rank`
    *   is the selection order (1 = most relevant); queries with fewer
    *   than `m` candidates simply stop early
    */
  def mmrRerank(candidates: DataFrame, queryIdCol: String, idCol: String,
      relCol: String, vecCol: String, m: Int,
      lambda: Double = 0.5): DataFrame = {
    import graft.functions.GraftExpressions.cosine_sim
    require(m >= 1, s"m must be >= 1, got $m")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val cand = candidates.select(col(queryIdCol).alias("query_id"),
        col(idCol).alias("_id"), col(relCol).cast(DoubleType).alias("_rel"),
        col(vecCol).alias("_vec"))
      .localCheckpoint(true) // probed by every step below
    def pickTop(scored: DataFrame, rank: Int, score: org.apache.spark.sql.Column) =
      scored.withColumn("_score", score)
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("_score").desc, col("_id"))))
        .where(col("_rn") === 1)
        .select(col("query_id"), col("_id"), col("_vec"),
          lit(rank).alias("mmr_rank"), col("_score").alias("mmr_score"))
    // the step-1 selection is checkpointed like every later step so the
    // returned plan never references cand's blocks — without this the
    // m == 1 path kept cand pinned until GC (ADVICE r13 storage leak)
    var selected = pickTop(cand, 1, col("_rel")).localCheckpoint(true)
    for (step <- 2 to m) {
      val selKeys = selected.select(col("query_id"), col("_id"))
      val remaining = cand.join(selKeys, Seq("query_id", "_id"), "left_anti")
      val maxSim = remaining.select(col("query_id"), col("_id"), col("_vec"))
        .join(selected.select(col("query_id"), col("_vec").alias("_svec")),
          Seq("query_id"))
        .groupBy(col("query_id"), col("_id"))
        .agg(max(cosine_sim(col("_vec"), col("_svec"))).alias("_maxsim"))
      val next = pickTop(remaining.join(maxSim, Seq("query_id", "_id")),
        step, lit(lambda) * col("_rel") - lit(1.0 - lambda) * col("_maxsim"))
      // m is small by construction; the checkpoint keeps the step-(i+1)
      // plan from re-deriving every earlier step's joins. The superseded
      // step's checkpoint is dropped once the new one materializes, so
      // storage holds one trajectory, not one copy per step (ADVICE r12).
      val prev = selected
      selected = selected.unionByName(next).localCheckpoint(true)
      graft.util.Checkpoints.release(prev) // unpersist was a no-op here (r20)
    }
    val out = selected.select(col("query_id"), col("_id").alias("neighbor_id"),
      col("mmr_rank"), col("mmr_score"))
    // the result no longer references cand's blocks (every `selected` is
    // a materialized checkpoint); the final checkpoint stays live because
    // `out` is computed from it lazily
    graft.util.Checkpoints.release(cand) // ditto — free the probe blocks now
    out
  }
}
