package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * language ID, quality scoring, fingerprinting. Composed from codegen'd
  * built-ins (plus [[GraftExpressions]] kernels) — no UDFs in the hot path.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish tokens: word pieces plus standalone punctuation — the unit a
    * byte-pair tokenizer would start from.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Stopword sets for the n-gram/stopword language-ID heuristic. Tiny,
    * high-frequency function words per language.
    */
  val StopwordSets: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"))

  /** Per-language overlap score: |tokens ∩ stopwords| / |tokens|. */
  def langScore(text: Column, lang: String): Column = {
    val toks = array_distinct(tokens(text))
    size(array_intersect(toks, array(StopwordSets(lang).map(lit): _*)))
      .cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** CJK-character ratio (the zh detector). */
  def cjkRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Per-script character counts — the script-mix profile multilingual
    * curation filters on (mixed-script spam, mojibake, wrong-corpus
    * leakage). Classes are EXPLICIT codepoint ranges, not `\p{script=}`
    * names, so the same regex text means the same thing in Java and
    * RE2-family engines and the counts are oracle-checkable. `other` =
    * everything else except ASCII space. Returns a struct
    * (n_latin, n_digit, n_cjk, n_cyrillic, n_arabic, n_other,
    * dominant_script) with deterministic tie order.
    */
  def scriptProfile(text: Column): Column = {
    def n(cls: String) =
      length(text) - length(regexp_replace(text, cls, ""))
    val latin = n("[A-Za-z]")
    val digit = n("[0-9]")
    val cjk = n("[\\x{4e00}-\\x{9fff}]")
    val cyr = n("[\\x{0400}-\\x{04ff}]")
    val ar = n("[\\x{0600}-\\x{06ff}]")
    val other = length(text) - latin - digit - cjk - cyr - ar -
      (length(text) - length(regexp_replace(text, "[ ]", "")))
    val scored: Seq[(String, Column)] = Seq(
      "latin" -> latin, "digit" -> digit, "cjk" -> cjk,
      "cyrillic" -> cyr, "arabic" -> ar)
    val dominant = scored.tail.foldLeft(lit("latin") -> scored.head._2) {
      case ((bl, bs), (l, s)) =>
        (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    struct(
      latin.alias("n_latin"), digit.alias("n_digit"), cjk.alias("n_cjk"),
      cyr.alias("n_cyrillic"), ar.alias("n_arabic"), other.alias("n_other"),
      when(dominant._2 > 0, dominant._1).otherwise(lit("none"))
        .alias("dominant_script"))
  }

  /** Heuristic language ID: highest stopword-overlap wins; CJK ratio > 0.2
    * short-circuits to zh; ties resolve in fixed en>de>fr>es order.
    */
  def languageId(text: Column): Column = {
    val langs = Seq("en", "de", "fr", "es")
    val scores = langs.map(l => l -> langScore(text, l))
    val best = scores.tail.foldLeft(lit("en") -> scores.head._2) {
      case ((bestLang, bestScore), (l, s)) =>
        (when(s > bestScore, lit(l)).otherwise(bestLang),
          when(s > bestScore, s).otherwise(bestScore))
    }
    when(cjkRatio(text) > 0.2, lit("zh"))
      .when(best._2 > 0, best._1)
      .otherwise(lit("und"))
  }

  /** Quality score in [0,1]: long-enough, low punctuation noise, healthy
    * mean word length, some stopwords (prose-ness). Fixed double arithmetic
    * (IEEE, same in any engine).
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks = tokenCount(text).cast("double")
    val punctRatio = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")
    val meanWordLen = nChars / greatest(nToks, lit(1.0))
    val lengthOk = when(nToks >= 20, lit(1.0)).otherwise(nToks / lit(20.0))
    val punctOk = when(punctRatio <= 0.1, lit(1.0)).otherwise(lit(1.0) - punctRatio)
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 10, lit(1.0)).otherwise(lit(0.5))
    val stopOk = when(langScore(text, "en") > 0, lit(1.0)).otherwise(lit(0.5))
    lit(0.4) * lengthOk + lit(0.2) * punctOk + lit(0.2) * wordLenOk + lit(0.2) * stopOk
  }

  /** PII scrubbing patterns: (placeholder, Java-regex). Deliberately plain
    * regex constructs (no lookaround, no named classes) so the same pattern
    * strings run identically under RE2-family engines — the patterns ARE
    * the contract, reusable verbatim in an external validator.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("<EMAIL>", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("<PHONE>", "[0-9]{2,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{4})?"),
    ("<ID>", "[0-9]{6,}"))

  /** Redact PII in place: each pattern's matches collapse to its
    * placeholder, applied in [[PiiPatterns]] order (email before phone
    * before bare id-runs, so a phone inside an email is never
    * double-redacted). Pure codegen'd `regexp_replace` chain — linear
    * scans, no UDF, safe to run over a 100 TB text column.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (placeholder, re)) =>
      regexp_replace(c, re, placeholder)
    }

  /** Count of PII matches, for scrub-rate accounting. Each pattern is
    * counted over the text with all PRIOR patterns already redacted —
    * exactly mirroring [[redactPii]]'s replacement order — so a digit run
    * inside an email counts once as <EMAIL>, never again as <ID>, and the
    * count equals the number of placeholder substitutions redactPii makes
    * (ADVICE r3: counting every pattern over the raw text overcounted).
    */
  def piiCount(text: Column): Column =
    PiiPatterns.foldLeft((lit(0), text)) {
      case ((cnt, cur), (placeholder, re)) =>
        (cnt + regexp_count(cur, lit(re)),
          regexp_replace(cur, re, placeholder))
    }._1

  /** Token-bounded document chunks with overlap — the pre-tokenization
    * split every training pipeline runs before packing sequences. Chunk i
    * covers tokens `[i·(maxTokens−overlap), …]`, `maxTokens` long (the
    * last chunk may be shorter); a doc at or under `maxTokens` yields one
    * chunk. Pure codegen'd array ops (`sequence`/`transform`/`slice`) —
    * no UDF, map-side only; callers `posexplode` the result.
    *
    * @return array<struct<start_tok int, chunk string, n_tok int>>
    */
  def chunkByTokens(text: Column, maxTokens: Int, overlap: Int): Column = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got maxTokens=$maxTokens overlap=$overlap")
    val step = maxTokens - overlap
    val toks = tokens(text)
    val n = size(toks)
    val starts = sequence(lit(0), greatest(ceil((n - overlap).cast("double") / step)
      .cast("int") - 1, lit(0)), lit(1))
    transform(starts, i => {
      val s = i * step
      val piece = slice(toks, s + 1, lit(maxTokens))
      struct(s.cast("int").alias("start_tok"),
        array_join(piece, " ").alias("chunk"),
        size(piece).alias("n_tok"))
    })
  }

  // ── Repetition metrics (Gopher-style quality filters, "Scaling Language
  // Models: Methods, Analysis & Insights from Training Gopher", Rae et al.
  // 2021 §A1.1: repetitious documents correlate with low quality) ──────────

  /** Trimmed, non-empty segments of the document under a separator regex. */
  private def segments(text: Column, sepRegex: String): Column =
    filter(transform(split(text, sepRegex), s => trim(s)), s => s =!= "")

  private def dupFraction(items: Column): Column =
    when(size(items) === 0, lit(0.0)).otherwise(
      (size(items) - size(array_distinct(items))).cast("double") /
        size(items).cast("double"))

  /** Fraction of segments that repeat an earlier segment (0 when empty).
    * Map-side array ops only — one pass over the text, no shuffle.
    */
  def duplicateSegmentFraction(text: Column, sepRegex: String): Column =
    dupFraction(segments(text, sepRegex))

  /** Duplicate-line fraction (Gopher's `duplicate_line_fraction`). */
  def duplicateLineFraction(text: Column): Column =
    duplicateSegmentFraction(text, "\n")

  /** Duplicate-paragraph fraction (blank-line separated). */
  def duplicateParagraphFraction(text: Column): Column =
    duplicateSegmentFraction(text, "\n{2,}")

  /** Fraction of tokens covered by the single most frequent word n-gram
    * (Gopher's `top_n_gram_fraction`): boilerplate and template text score
    * high. A native codegen'd kernel ([[SketchOps.topNgramFractions]]) —
    * the r7 higher-order-function fold was algorithmically right
    * (O(L log L), map-side) but paid an interpreted-lambda constant that
    * made it the slowest batch query; the kernel is the same algorithm as
    * one static call per row. Shorter-than-n documents score 0; degenerate
    * overlapping self-repeats clamp to exactly 1.
    */
  def topNgramFraction(text: Column, n: Int): Column =
    element_at(GraftExpressions.top_ngram_fractions(text, Seq(n)), 1)

  /** All of `ns`'s repetition fractions from ONE tokenization pass —
    * array-positional results (`element_at(_, i+1)` for `ns(i)`); what a
    * real curation pass computing 2- and 3-gram filters together wants.
    */
  def topNgramFractions(text: Column, ns: Seq[Int]): Column =
    GraftExpressions.top_ngram_fractions(text, ns)

  // ── Gopher rule-set flags ("Scaling Language Models: Methods, Analysis
  // & Insights from Training Gopher", Rae et al. 2021 §A1.1: the document-
  // level heuristics applied to MassiveWeb before training) ───────────────

  /** Gopher's stop-word list: a passing document must contain at least
    * [[GopherMinStopwords]] DISTINCT words from this set (the "contains at
    * least 2 of the following English words" rule — a cheap prose check).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStopwords = 2

  /** The Gopher rule-set quality flags, one struct per document: the seven
    * measured quantities and the seven per-rule booleans (+ `pass`, their
    * conjunction). Published thresholds: 50 ≤ words ≤ 100 000, mean word
    * length in [3, 10], symbol-to-word ratio (# and ellipsis) ≤ 0.1, ≥ 80%
    * of words contain an alphabetic character, ≤ 90% of lines start with a
    * bullet, ≤ 30% end with an ellipsis, ≥ 2 distinct stop words.
    *
    * Everything is a map-side expression over one row — integer counts and
    * IEEE divisions of those counts, so any engine computing the same
    * counts produces bit-identical ratios (the property the oracle gate
    * relies on). The two array-lambda filters (alpha words, line shapes)
    * are interpreted HOFs — O(tokens) per row on a boolean regex, far off
    * the cost cliff `topNgramFraction` hit (per-gram hashing in a fold).
    */
  def gopherFlags(text: Column): Column = {
    val toks = tokens(text)
    val nWords = size(toks)
    val nWordsD = greatest(nWords, lit(1)).cast("double")
    // mean word length over the same whitespace tokens: non-ws chars/words
    val meanLen = length(regexp_replace(trim(text), "\\s+", ""))
      .cast("double") / nWordsD
    // Gopher's symbol set: '#' and ellipsis ("…" or "..."); replace() is
    // greedy non-overlapping, so "...." counts one "..." — both engines
    val nSymbols = (length(text) - length(replace(text, lit("#"), lit("")))) +
      (length(text) - length(replace(text, lit("…"), lit("")))) +
      (length(text) - length(replace(text, lit("..."), lit("")))) / lit(3)
    val symbolRatio = nSymbols.cast("double") / nWordsD
    val alphaFrac = size(filter(toks, t => t.rlike("[a-zA-Z]")))
      .cast("double") / nWordsD
    val lines = split(text, "\n")
    val nLinesD = greatest(size(lines), lit(1)).cast("double")
    val bulletFrac = size(filter(lines, l => l.rlike("^\\s*[•\\-*]")))
      .cast("double") / nLinesD
    val ellipsisFrac = size(filter(lines, l => l.rlike("(…|\\.\\.\\.)\\s*$")))
      .cast("double") / nLinesD
    val nStop = size(array_intersect(array_distinct(toks),
      array(GopherStopwords.map(lit): _*)))
    val flagWords = nWords >= 50 && nWords <= 100000
    val flagMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val flagSymbol = symbolRatio <= 0.1
    val flagAlpha = alphaFrac >= 0.8
    val flagBullet = bulletFrac <= 0.9
    val flagEllipsis = ellipsisFrac <= 0.3
    val flagStop = nStop >= GopherMinStopwords
    struct(
      nWords.cast("long").alias("n_words"),
      meanLen.alias("mean_word_len"),
      symbolRatio.alias("symbol_ratio"),
      alphaFrac.alias("alpha_frac"),
      bulletFrac.alias("bullet_frac"),
      ellipsisFrac.alias("ellipsis_frac"),
      nStop.cast("long").alias("n_stop"),
      flagWords.alias("flag_words"),
      flagMeanLen.alias("flag_mean_len"),
      flagSymbol.alias("flag_symbol"),
      flagAlpha.alias("flag_alpha"),
      flagBullet.alias("flag_bullet"),
      flagEllipsis.alias("flag_ellipsis"),
      flagStop.alias("flag_stop"),
      (flagWords && flagMeanLen && flagSymbol && flagAlpha &&
        flagBullet && flagEllipsis && flagStop).alias("pass"))
  }

  // ── C4-style cleaning (Raffel et al. 2020 §2.2: the line- and page-
  // level heuristics that produced C4 from Common Crawl) ──────────────────

  /** C4's line/page filter. Line level: keep lines with ≥
    * `minWordsPerLine` words, ending in terminal punctuation (when
    * `requireTerminalPunct`), and not mentioning "javascript". Page level:
    * a page containing "lorem ipsum" or "{", or retaining fewer than
    * `minSentences` sentence-enders after line filtering, comes back as
    * the EMPTY string (not dropped — same auditability convention as
    * [[graft.operators.Dedup.removeDuplicatedSpans]]; a downstream
    * `length > 0` filter realizes the drop). Sentence count is
    * approximated by terminal-punctuation marks in the kept text — C4
    * sentence-splits with a tokenizer; a punctuation count is the same
    * signal without a model dependency.
    *
    * Entirely map-side built-ins: one pass over lines, no shuffle, no UDF.
    */
  def c4Clean(text: Column, minWordsPerLine: Int = 5,
      requireTerminalPunct: Boolean = true, minSentences: Int = 3): Column = {
    val kept = filter(split(text, "\n"), l => {
      val lt = trim(l)
      val wordsOk = size(split(lt, "\\s+")) >= minWordsPerLine
      val punctOk =
        if (requireTerminalPunct) lt.rlike("[.!?\"']$") else lit(true)
      wordsOk && punctOk && !lower(lt).contains("javascript")
    })
    val cleanText = array_join(kept, "\n")
    val nSentences =
      length(cleanText) - length(regexp_replace(cleanText, "[.!?]", ""))
    val pageDrop = lower(text).contains("lorem ipsum") ||
      text.contains("{") || nSentences < minSentences
    when(pageDrop, lit("")).otherwise(cleanText)
  }

  /** 64-bit token hashes — input to SimHash and the rolling fingerprint.
    * FNV-1a/64 over each token's code points (a codegen'd kernel, one call
    * per row) rather than r8's `transform(tokens, xxhash64)`: xxhash64 is
    * engine-internal, so the fingerprint/simhash gates could never be
    * oracle-checked; the FNV fold is plain wrap-around int64 arithmetic any
    * engine with 128-bit integers replays exactly (DuckDB: HUGEINT
    * `% 2^64`), which graduates both gates to hash-gated.
    */
  def tokenHashes(text: Column): Column =
    GraftExpressions.fnv_token_hashes(text)

  /** Greedy longest-match WordPiece tokens against a fixed vocabulary —
    * the real-tokenizer upgrade over [[bpeishTokenCount]]'s regex
    * heuristic for token budgets, packing, and chunk boundaries.
    * Continuation pieces carry `##`; unmatched words become `[UNK]`.
    */
  def wordpieceTokens(text: Column, vocab: Seq[String]): Column =
    GraftExpressions.wordpiece_tokens(text, vocab)

  /** Exact WordPiece token count under the given vocabulary. */
  def wordpieceCount(text: Column, vocab: Seq[String]): Column =
    size(wordpieceTokens(text, vocab))

  /** Winnowing-style document fingerprint over `window`-token shingles. */
  def fingerprint(text: Column, window: Int = 5): Column =
    GraftExpressions.rolling_fingerprint(tokenHashes(text), window)

  /** 64-bit SimHash of the document's token set. */
  def simhash(text: Column): Column =
    GraftExpressions.simhash64(tokenHashes(text))

  /** The GPT-2 pre-tokenizer pattern (Radford et al. 2019, encoder.py —
    * the published regex), with ONE house adaptation: the whitespace
    * class is EXPLICIT (` \t\n\r\f`) instead of `\s`, because Java's
    * `\s` includes vertical tab while RE2-family engines' does not —
    * the same shared-regex contract [[graft.operators.Dedup.normalizedText]]
    * documents. Alternation order is semantic (contractions before
    * runs); the lookahead branch releases the LAST whitespace char of a
    * run so it glues to the following word (` world`), the byte-level
    * convention every deployed GPT-family tokenizer uses.
    */
  val Gpt2PreTokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+|" +
      "[ \\t\\n\\r\\f]+(?![^ \\t\\n\\r\\f])|[ \\t\\n\\r\\f]+"

  /** GPT-2 pre-tokenization: the text as its ordered array of pattern
    * matches (every char lands in exactly one token). Codegen'd regex —
    * one map-side pass; the DuckDB oracle replays the alternation as a
    * positional recursive CTE because RE2 lacks the lookahead.
    */
  def preTokenizeGpt2(text: Column): Column =
    regexp_extract_all(text, lit(Gpt2PreTokenPattern), lit(0))
}
