package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines.
  *
  * Everything here composes built-in `org.apache.spark.sql.functions`
  * (split / filter / transform / regexp_count / xxhash64 / md5) so the
  * whole column stays inside whole-stage codegen — no Scala UDF
  * boxing, no Python round-trips; these run at scan throughput on a
  * 100 TB corpus. The reference has no text operators at all (its only
  * string ops are trim/pad, SURVEY.md §2.6) — this layer is the
  * north-star extension.
  */
object TextFunctions {

  /** Whitespace tokens. Single-space joined corpora (our `documents`
    * table) round-trip exactly; `\\s+` variant for messy text.
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: word-or-punct chunks, plus a length/4 term
    * for long words (BPE splits rare long words into multiple units).
    * A deterministic, codegen'd estimator — NOT a real tokenizer, but
    * scale-correct for data-budget accounting.
    */
  def bpeTokenEstimate(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"))

  def charCount(text: Column): Column = length(text)

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[\\.,;:!\\?]"))

  /** Ratio of tokens found in `stopwords` — the classic
    * natural-language-vs-garbage quality signal. Codegen'd single-pass
    * kernel (TokenSetCountExpr); the HOF reference below cross-checks.
    */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    TextExpr.tokenSetCount(text, stopwords)

  /** Reference HOF formulation (interpreted; spec cross-check only). */
  def stopwordCountHof(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(stopwords: _*)))

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from")

  /** Composite quality score in [0,1]: stopword density + length signal
    * + punctuation sanity. Deterministic arithmetic over codegen'd
    * counts; mirrors 1:1 into the DuckDB oracle SQL.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = stopwordCount(text, EnStopwords).cast("double") / nTok
    val lenSignal = least(nTok / lit(64.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / nTok
    round(
      lit(0.4) * least(stopRatio * lit(4.0), lit(1.0)) +
        lit(0.4) * lenSignal +
        lit(0.2) * (lit(1.0) - least(punctRatio, lit(1.0))), 4)
  }

  /** Gopher-style quality rules (q219 / the qualitygate module) as
    * named boolean columns — single source of truth for both the
    * oracle query and the DSL. Every threshold is integer
    * cross-multiply arithmetic except the entropy gate (whose kernel
    * value is exact-decimal-derived, hence engine-identical).
    */
  def gopherRules(text: Column, minWords: Int = 25,
                  maxWords: Int = 100000): Seq[(String, Column)] = {
    val ws = tokens(text)
    val n = size(ws)
    val wc = length(text) - (n - lit(1))
    Seq(
      "r_len" -> (n >= minWords && n <= maxWords),
      "r_wordlen" -> (wc >= n * 3 && wc <= n * 10),
      "r_punct" -> (punctCount(text) * 10 <= n),
      "r_stop" -> (stopwordCount(text, EnStopwords) >= 2),
      "r_distinct" -> (size(array_distinct(ws)) * 10 >= n * 3),
      "r_entropy" -> (TextExpr.charEntropy(text) >= 2.0))
  }

  /** Language-ID: tiny per-language function-word marker lists, scored
    * by marker hits, argmax with a fixed priority order for ties.
    * A deterministic heuristic (n-gram-free variant of the classic
    * stopword profile method) — expressible identically in ANSI SQL,
    * so it stays oracle-checkable.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "zh" -> Seq("的", "是", "不", "了", "在", "我"))

  def langScore(text: Column, markers: Seq[String]): Column =
    TextExpr.tokenSetCount(text, markers)

  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> langScore(text, m) }
    // Priority = declaration order; a language wins only with a
    // strictly greater score than every earlier language.
    scores.tail.foldLeft((lit("en"): Column, scores.head._2)) {
      case ((bestLang, bestScore), (l, sc)) =>
        (when(sc > bestScore, lit(l)).otherwise(bestLang),
          when(sc > bestScore, sc).otherwise(bestScore))
    }._1
  }

  /** Canonical text normalization for dedup robustness: lowercase,
    * strip non-alphanumerics, collapse runs of spaces, trim. Composed
    * from codegen'd built-ins; mirrors 1:1 into the oracle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), lit("[^a-z0-9 ]"), lit("")),
      lit(" +"), lit(" ")))

  /** Content fingerprint for exact dedup: md5 hex (cross-engine
    * comparable); xxhash64 for speed when the oracle isn't involved.
    */
  def fingerprint(text: Column): Column = md5(text)

  def fastFingerprint(text: Column): Column = xxhash64(text)

  // ---- Gopher/MassiveText repetition filters (q245) -----------------
  //
  // The OTHER half of the Gopher quality suite (gopherRules covers the
  // rule gates): within-document repetition — duplicate lines, and the
  // character mass captured by repeated word n-grams. The classic
  // boilerplate/spam detectors every pretraining curation pass runs
  // (Rae et al. 2021 Table A1; same stats in the FineWeb/Dolma
  // pipelines). All arithmetic is exact integers over per-row
  // higher-order functions: ZERO shuffles, the whole battery rides the
  // scan. Cost note: the n-gram stats are O(distinct·occurrences) per
  // document — quadratic in doc length worst case, fine for web-doc
  // lengths (≤ ~10⁴ words ⇒ ≤ ~10⁸ cheap string compares per hot doc);
  // for book-length inputs truncate first or switch to an exploded
  // (doc, gram) hash-agg, which trades one shuffle for linearity.

  /** Whitespace tokens splitting on space OR newline (repetition stats
    * see multi-line docs, so line breaks must break words too).
    */
  def multilineTokens(text: Column): Column =
    filter(split(text, "[ \n]"), w => w =!= "")

  private def charsOf(arr: Column): Column =
    aggregate(arr, lit(0L), (a, x) => a + length(x).cast("long"))

  /** Word n-grams over a PRE-TOKENIZED word array (single-space-joined
    * strings, 1-indexed positions); empty array when fewer than `n`
    * words. The sibling of [[wordNgrams]], which tokenizes raw text.
    */
  def tokenNgrams(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(o => element_at(words, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Character mass of the MOST FREQUENT word n-gram:
    * `count(top gram) · length(top gram)` (the gram string includes its
    * single separating spaces). Ties break to the lexicographically
    * smallest gram — deterministic, so the oracle's
    * `ORDER BY c DESC, g ASC` rank replays it exactly.
    */
  def topNgramCharMass(words: Column, n: Int): Column = {
    val g = tokenNgrams(words, n)
    val best = aggregate(array_distinct(g),
      struct(lit(0L).as("c"), lit("").as("g")),
      (acc, x) => {
        val c = size(filter(g, y => y === x)).cast("long")
        when(c > acc("c") || (c === acc("c") && x < acc("g")),
          struct(c.as("c"), x.as("g"))).otherwise(acc)
      })
    best("c") * length(best("g")).cast("long")
  }

  /** Character mass of DUPLICATED word n-grams: for every gram
    * occurring more than once, `(count − 1) · length(gram)` — the
    * occurrences beyond the first, the "duplicate n-gram character
    * fraction" numerator.
    */
  def dupNgramCharMass(words: Column, n: Int): Column = {
    val g = tokenNgrams(words, n)
    aggregate(array_distinct(g), lit(0L), (acc, x) => {
      val c = size(filter(g, y => y === x)).cast("long")
      acc + when(c > lit(1L), (c - lit(1L)) * length(x).cast("long"))
        .otherwise(lit(0L))
    })
  }

  /** The full repetition battery as named exact-integer columns,
    * computed by the single-pass codegen kernel
    * ([[graft.functions.RepetitionKernel]] — one tokenize per doc,
    * hash-map counts, O(len·n); the HOF formulation below is kept as
    * the semantic reference and pinned bit-equal in TextKernelsSpec).
    * Fractions are NOT materialized — gate with integer
    * cross-multiplies against the published thresholds (e.g. duplicate
    * line fraction > 0.30 ⇔ `dup_lines·10 > n_lines·3`), so no float
    * ever enters the decision. Columns: see [[RepetitionKernel]]
    * (`dup5_masked` is the published position-masked Gopher metric,
    * bounded by `gram_den` — gate dup-5 on IT; `dup5_chars` is the
    * unbounded Σ(c−1)·len surrogate, reported for diagnostics).
    */
  def repetitionStats(text: Column): Seq[(String, Column)] = {
    val st = RepetitionExpr.repetitionStats(text)
    RepetitionKernel.fieldNames.map(nm => nm -> st.getField(nm))
  }

  /** HTML→main-content extraction (q249, `htmlextract` module): one
    * codegen'd pass per page — block segmentation at block-level tags,
    * then the jusText length + link-density gate per block. Columns:
    * see [[HtmlKernel]]. Deterministic and oracle-replayable; the
    * field extraction shares ONE kernel call via codegen CSE, same as
    * [[repetitionStats]].
    */
  def htmlExtract(html: Column, minChars: Int = 25,
                  linkDen: Int = 3): Seq[(String, Column)] = {
    val st = HtmlExpr.htmlExtract(html, minChars, linkDen)
    HtmlKernel.fieldNames.map(nm => nm -> st.getField(nm))
  }

  /** Interpreted higher-order-function reference of the repetition
    * battery (all columns except `dup5_masked`, which has no tractable
    * HOF form) — O(distinct·occurrences·len) per doc, ~500× the
    * kernel; used ONLY to cross-check [[repetitionStats]] in specs.
    */
  def repetitionStatsHof(text: Column): Seq[(String, Column)] = {
    val lines = filter(split(text, "\n"), l => l =!= "")
    val dlines = array_distinct(lines)
    val words = multilineTokens(text)
    val nw = size(words)
    Seq(
      "n_lines" -> size(lines).cast("long"),
      "dup_lines" -> (size(lines) - size(dlines)).cast("long"),
      "line_chars" -> charsOf(lines),
      "dup_line_chars" -> (charsOf(lines) - charsOf(dlines)),
      "gram_den" -> when(nw > 0, charsOf(words) + nw.cast("long") - lit(1L))
        .otherwise(lit(0L)),
      "top2_num" -> topNgramCharMass(words, 2),
      "top3_num" -> topNgramCharMass(words, 3),
      "dup5_chars" -> dupNgramCharMass(words, 5))
  }

  /** Word n-grams as an array column — the codegen'd single-pass
    * Expression (see TextExpressions.scala; the HOF formulation below
    * is kept as the semantic reference for its spec).
    */
  def wordNgrams(text: Column, n: Int): Column = TextExpr.wordNgrams(text, n)

  /** Reference HOF formulation of wordNgrams (interpreted lambdas —
    * ~10× slower than the Expression; used only to cross-check it).
    */
  def wordNgramsHof(text: Column, n: Int): Column = {
    val ws = tokens(text)
    // Guard: Spark's sequence(1, 0) DESCENDS ([1,0]) rather than being
    // empty — short docs must return [] explicitly.
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ws) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*)))
  }
}
