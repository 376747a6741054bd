package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, shingling and
  * document fingerprinting (SURVEY.md §2.9 X4).
  *
  * Everything here is a pure Catalyst column expression (built-in functions +
  * higher-order array functions) — no UDFs — so the whole text pipeline stays
  * inside whole-stage codegen and scales linearly with no shuffle: per-row
  * work only. At 100 TB these run as a map-only stage fused into the scan.
  */
object TextStats {

  /** Whitespace tokenization, dropping empty tokens (leading/trailing space).
    *
    * Deliberately lambda-free (`trim` + `split`, not `filter(split, ...)`):
    * expressions containing lambda functions are excluded from codegen
    * common-subexpression elimination, so the lambda form re-tokenized the
    * text once per reference (quality scoring alone references tokens ~6×). */
  def tokens(text: Column): Column = {
    // null text ≡ empty document: every downstream count/ratio/packing
    // operator then sees 0 tokens instead of a null that poisons sums
    // (ANSI size(null) is null → NPEs in driver-side collects) or, with
    // ANSI off, the notorious size(null) = -1
    // trim() strips only ASCII space — strip ALL whitespace at the edges so
    // split can't produce empty edge tokens (tabs/newlines included)
    val tr = regexp_replace(coalesce(text, lit("")), "^\\s+|\\s+$", "")
    when(length(tr) === 0, array().cast("array<string>"))
      .otherwise(split(tr, "\\s+"))
  }

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: tokens split further on letter/digit boundaries
    * and runs of length 4 — approximates subword token counts without a
    * vocabulary (real BPE needs a model file; the regex keeps it engine-pure). */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[a-zA-Z])(?=[0-9])|(?=[^a-zA-Z0-9\\s])|(?<=[^a-zA-Z0-9\\s])|\\s+"),
      t => length(t) > 0))

  /** REAL subword tokenization: BPE against a caller-supplied monotone merge
    * table (the codegen'd [[graft.functions.BpeEncode]] expression — rank-map
    * lookup per adjacent pair, cost bounded by word length, independent of
    * vocab size). An EMPTY merge table degrades to the character split per
    * word — the provable point where `size(bpeTokens(t, Nil))` equals the
    * non-whitespace character count. Map-only, fuses into the scan; the
    * compiled table rides the expression to executors once per task-set.
    * Requires the graft function registry (registered lazily here). */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column = {
    // lazy per-session registration: call_function resolves against the
    // ACTIVE session at analysis time, so registering here (idempotent)
    // spares every call site the GraftFunctions.register boilerplate
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.register)
    graft.functions.GraftFunctions.bpeTokens(text, merges)
  }

  /** BPE token count — THE curation quantity: token budgets, packing bins
    * and per-source quotas all spend in tokenizer tokens, and whitespace
    * counts drift 3–5× from BPE reality on web text. Null text ⇒ 0 (same
    * convention as [[tokens]]: every downstream budget sum sees zero, not a
    * null that rides a running sum invisibly). Feed this to
    * [[packSequencesByCount]] / [[selectUnderTokenBudgetByCount]] /
    * [[selectUnderTokenBudgetPerGroupByCount]]. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeTokens(coalesce(text, lit("")), merges))

  /** Distinct-token count. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length in characters (0.0 for empty docs). */
  def avgTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
          length(text))

  /** Fraction of tokens found in `stopwords` (lowercased comparison — the
    * list is lowercased too, so "The" in the caller's list still matches). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(lower(text))
    val sw = stopwords.map(_.toLowerCase)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, w => w.isInCollection(sw))).cast("double") / size(t))
  }

  /** X43 — character-entropy gibberish signal: the Shannon entropy of the
    * document's character-unigram distribution, as the exact integer sum
    * Σ_c count(c) · round(1e6 · ln(n / count(c))) in micro-nat·chars
    * (divide by n_chars for per-char entropy — kept as (sum, n) so the
    * value stays an integer and the oracle replays it without a float
    * division). Low values flag the corpus junk a token-level filter
    * misses: "aaaa…" runs, single-char spam, binary-ish payloads pasted as
    * text; very high values flag base64/hex blobs when paired with a
    * length floor. ROW-LOCAL by construction — distinct chars and their
    * counts come from array higher-order functions over the char split, so
    * the whole signal is map-only (no explode, no shuffle): the 100 TB
    * shape, O(distinct_chars · n) per document. The only cross-engine risk
    * is ln's last ulp at a 0.5e-6 rounding boundary (the weightedSampleK
    * caveat); the sum itself is order-free integer arithmetic. */
  def charEntropySumMicro(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val chars = when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, ""))
    val n = size(chars)
    // O(n log n), not O(distinct·n): sort the chars and fold ONCE over the
    // runs — the naive per-distinct-char filter is quadratic exactly when
    // it hurts (CJK text, where most characters are distinct). A term
    // closes when the character changes; the appended "" sentinel (never a
    // real 1-char split element) closes the final run. The SUM is
    // order-free integer arithmetic, so the iteration order change leaves
    // every value — and the oracle — untouched.
    val sorted = concat(array_sort(chars), array(lit("")))
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
      (st, c) => {
        val run = st.getField("run")
        val term = when(run === 0L, lit(0L))
          .otherwise(run *
            round(lit(1e6) * log(n.cast("double") / run.cast("double"))).cast("long"))
        when(c === st.getField("prev"),
          struct(st.getField("prev").as("prev"), (run + 1L).as("run"),
            st.getField("acc").as("acc")))
          .otherwise(struct(c.as("prev"), lit(1L).as("run"),
            (st.getField("acc") + term).as("acc")))
      },
      st => st.getField("acc"))
  }

  /** Heuristic document-quality score in [0,1] — the standard pretraining
    * filters (length, punctuation balance, lexical diversity) combined with
    * fixed weights. Deterministic double arithmetic: identical on any engine. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / 64.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val diversity = when(nTok === 0.0, lit(0.0))
      .otherwise(distinctTokenCount(text).cast("double") / nTok)
    round(lengthScore * 0.4 + punctScore * 0.3 + diversity * 0.3, 6)
  }

  /** Gopher's default stopword screen: ≥2 distinct of these 8 English
    * function words (Rae et al. 2021 Table A1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style composite quality rules (Rae et al. 2021, "Scaling
    * Language Models", Table A1): each document gets a per-rule boolean plus
    * the conjunction `keep` — the rule-by-rule transparency is the point
    * (a pipeline tunes thresholds by inspecting WHICH rule rejects, which a
    * single fused score like [[qualityScore]] cannot show).
    *
    * Every ratio is exact integer arithmetic divided once into double, and
    * all regexes sit in the Java∩RE2 common subset, so the struct is
    * engine-replayable bit-for-bit. Bounds are inclusive on both ends
    * (Gopher's "between" reads inclusively). Word-count bounds are
    * parameters: Gopher's 50..100k is tuned for web pages, and callers
    * filtering short-form corpora need the knob.
    *
    * Line-level rules split on '\n' only (not \r\n): the oracle's
    * `string_split(text, chr(10))` must see byte-identical lines.
    * Bullet/ellipsis detection tolerates leading/trailing SPACES AND TABS
    * explicitly (`[ \t]`) — never regex `\s`, whose membership differs
    * between Java (\x0B in) and RE2 (\x0B out).
    *
    * The stopword screen is parameterized (`stopwords`, `minStopHits`;
    * defaults = Gopher's ≥2 of its 8 English function words) because it is
    * the one rule that is corpus-RELATIVE: a non-English or
    * domain-restricted corpus needs its own function-word list, and a
    * fixed English list silently rejects everything (the q145 fixture
    * exercises exactly that re-pointing).
    *
    * Table A1's REPETITION screens are rules in the conjunction too (they
    * previously lived only in [[repetitionStats]], outside the gate):
    *
    *   - `ok_dup_lines`: fraction of non-blank lines that are repeats of an
    *     earlier identical line (raw-byte identity; blankness judged after
    *     `[ \t]` edge-stripping, the line-rule convention above) must stay
    *     ≤ `maxDupLineFrac` (Gopher: 0.30);
    *   - `ok_dup_line_chars`: fraction of non-blank-line CHARACTERS sitting
    *     in those repeated occurrences ≤ `maxDupLineCharFrac` (Gopher:
    *     0.20);
    *   - `ok_top_ngram`: characters covered by the most frequent word
    *     `ngramN`-gram — occurrences × gram length over `length(text)` —
    *     ≤ `maxTopNgramCharFrac` (Gopher: 0.20 for 2-grams). The rule is a
    *     REPETITION screen, so it only fires on grams occurring ≥ 2 times
    *     (a short document whose every gram is unique still has a "most
    *     common" gram covering a large char share — that is brevity, not
    *     boilerplate; the word-count rule owns brevity). "Most frequent"
    *     ties break to the LEXICOGRAPHICALLY SMALLEST gram; the tie-break
    *     is semantics, not hygiene, because tied grams of different
    *     lengths give different fractions. The mode count runs as a
    *     sort-then-longest-run pass over the gram array (O(g log g) per
    *     row, still map-only) — the per-distinct-gram filter scan would be
    *     O(g²) on exactly the repetitive documents this rule exists to
    *     catch.
    *
    * Documents with no lines / no grams pass the respective screens
    * (nothing repeated), mirroring the n = 0 conventions above. */
  def gopherFlags(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] = gopherStopwords, minStopHits: Int = 2,
      ngramN: Int = 2, maxTopNgramCharFrac: Double = 0.2,
      maxDupLineFrac: Double = 0.3, maxDupLineCharFrac: Double = 0.2)
      : Column = {
    require(ngramN >= 1, s"ngramN must be >= 1, got $ngramN")
    gopherStructFrom(text, tokens(text),
      split(coalesce(text, lit("")), "\n"), array_sort(shingles(text, ngramN)),
      minWords, maxWords, stopwords, minStopHits, maxTopNgramCharFrac,
      maxDupLineFrac, maxDupLineCharFrac)
  }

  /** [[gopherFlags]] with the shared array subtrees BOUND ONCE — the form
    * the hot-path queries use. The Column form above repeats the
    * tokenize / line-split / shingle-sort trees across its eleven rules,
    * and the HOF-bearing projection is excluded from whole-stage codegen,
    * so no subexpression elimination rescues it — the interpreted
    * projection re-tokenizes per rule family (measured 1.8–2× the bound
    * form at sf0.1). Here one projection materializes `tokens`, `lines`
    * and the sorted gram array as attributes; the rule projection then
    * references attributes, paying each shared subtree exactly once per
    * row. Same struct, bit-identical flags (TextSpec pins equivalence).
    * Reserved temp columns `__gopher_{t,lines,grams}` must be absent. */
  def gopherFlagsBound(df: org.apache.spark.sql.DataFrame, text: Column,
      outCol: String, minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] = gopherStopwords, minStopHits: Int = 2,
      ngramN: Int = 2, maxTopNgramCharFrac: Double = 0.2,
      maxDupLineFrac: Double = 0.3, maxDupLineCharFrac: Double = 0.2)
      : org.apache.spark.sql.DataFrame = {
    require(ngramN >= 1, s"ngramN must be >= 1, got $ngramN")
    val temps = Seq("__gopher_t", "__gopher_lines", "__gopher_grams")
    val clash = temps.filter(df.columns.contains)
    require(clash.isEmpty, s"reserved column(s) in use: ${clash.mkString(",")}")
    df.withColumn("__gopher_t", tokens(text))
      .withColumn("__gopher_lines", split(coalesce(text, lit("")), "\n"))
      .withColumn("__gopher_grams", array_sort(shingles(text, ngramN)))
      .withColumn(outCol, gopherStructFrom(text, col("__gopher_t"),
        col("__gopher_lines"), col("__gopher_grams"),
        minWords, maxWords, stopwords, minStopHits, maxTopNgramCharFrac,
        maxDupLineFrac, maxDupLineCharFrac))
      .drop(temps: _*)
  }

  /** The eleven Gopher rules over caller-supplied shared subtrees: `t` =
    * [[tokens]](text), `lines` = '\n'-split, `sortedGrams` = sorted word
    * n-grams. ONE definition of the rule arithmetic — both entry points
    * above delegate here, so the bound fast path can never drift from the
    * Column form. */
  private def gopherStructFrom(text: Column, t: Column, lines: Column,
      sortedGrams: Column, minWords: Int, maxWords: Int,
      stopwords: Seq[String], minStopHits: Int, maxTopNgramCharFrac: Double,
      maxDupLineFrac: Double, maxDupLineCharFrac: Double): Column = {
    val n = size(t)
    val nD = n.cast("double")
    // mean word length over codepoint-free fixture text (length() counts
    // UTF-16 units; the corpus convention since q22 — BMP-safe)
    val meanLen = when(n === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (a, w) => a + length(w)).cast("double") / nD)
    // Gopher's symbol screen: '#' and '…' occurrences per word
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = length(text) - length(regexp_replace(text, "…", ""))
    val symbolRatio = when(n === 0, lit(0.0))
      .otherwise((hashes + ellipses).cast("double") / nD)
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l => l.rlike("^[ \t]*[-*•]")))
    val ellipsisLines = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)[ \t]*$")))
    val alphaWords = size(filter(t, w => w.rlike("[A-Za-z]")))
    val stopHits = size(array_intersect(
      transform(t, w => lower(w)), array(stopwords.map(w => lit(w.toLowerCase)): _*)))
    val okWords = n >= minWords && n <= maxWords
    val okMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val okSymbols = symbolRatio <= 0.1
    val okBullets = when(nLines === 0, lit(true))
      .otherwise(bulletLines.cast("double") / nLines.cast("double") <= 0.9)
    val okEllipsis = when(nLines === 0, lit(true))
      .otherwise(ellipsisLines.cast("double") / nLines.cast("double") <= 0.3)
    val okAlpha = when(n === 0, lit(false))
      .otherwise(alphaWords.cast("double") / nD >= 0.8)
    val okStop = stopHits >= minStopHits
    // --- Table A1 repetition screens ------------------------------------
    // duplicate lines: identity is the RAW line; blank lines are excluded
    // from both numerator and denominator (two empty lines are formatting,
    // not repetition). array_distinct keeps first occurrences, so the char
    // numerator counts repeat OCCURRENCES' characters.
    val nbLines = filter(lines, l =>
      length(regexp_replace(l, "^[ \t]+|[ \t]+$", "")) > 0)
    val nNb = size(nbLines)
    val distinctNb = array_distinct(nbLines)
    val dupLineFrac = when(nNb === 0, lit(0.0))
      .otherwise((nNb - size(distinctNb)).cast("double") / nNb.cast("double"))
    val nbChars = aggregate(nbLines, lit(0L), (a, l) => a + length(l))
    val distinctChars = aggregate(distinctNb, lit(0L), (a, l) => a + length(l))
    val dupLineCharFrac = when(nbChars === 0, lit(0.0))
      .otherwise((nbChars - distinctChars).cast("double") / nbChars.cast("double"))
    val okDupLines = dupLineFrac <= maxDupLineFrac
    val okDupLineChars = dupLineCharFrac <= maxDupLineCharFrac
    // top n-gram: longest run in the SORTED gram array = the mode count;
    // a strictly-greater update means the first (lexicographically
    // smallest) gram reaching the maximal run is the one reported
    val topRun = aggregate(sortedGrams,
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit("").as("bg")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          when(run > acc.getField("best"), run)
            .otherwise(acc.getField("best")).as("best"),
          when(run > acc.getField("best"), g)
            .otherwise(acc.getField("bg")).as("bg"))
      })
    val nChars = length(coalesce(text, lit("")))
    val topNgramCharFrac = when(nChars === 0 || topRun.getField("best") < 2L,
        lit(0.0))
      .otherwise((topRun.getField("best") * length(topRun.getField("bg")))
        .cast("double") / nChars.cast("double"))
    val okTopNgram = topNgramCharFrac <= maxTopNgramCharFrac
    struct(
      n.as("n_words"),
      okWords.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbols.as("ok_symbol_ratio"),
      okBullets.as("ok_bullet_lines"),
      okEllipsis.as("ok_ellipsis_lines"),
      okAlpha.as("ok_alpha_words"),
      okStop.as("ok_stopwords"),
      okDupLines.as("ok_dup_lines"),
      okDupLineChars.as("ok_dup_line_chars"),
      okTopNgram.as("ok_top_ngram"),
      (okWords && okMeanLen && okSymbols && okBullets && okEllipsis &&
        okAlpha && okStop && okDupLines && okDupLineChars && okTopNgram)
        .as("keep"))
  }

  /** Word n-gram shingles: `"a b c d"` with n=3 → `["a b c", "b c d"]`.
    * Empty array when the document has fewer than n tokens.
    *
    * Built by zip_with-ing the token array with its k-shifted slices rather
    * than `transform(sequence(...), i => slice(tokens, i+1, n))`: a lambda
    * body re-evaluates every non-lambda subexpression PER ELEMENT (and
    * lambda-bearing trees are excluded from codegen subexpression
    * elimination), which made shingling O(tokens²) per document. Here the
    * token array appears only as zip_with *inputs*, evaluated per row. */
  def shingles(text: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    val t = tokens(text)
    // acc[i] = tokens i..i+k joined; extend one shift per round. zip_with
    // pads the shorter side with null and concat propagates it, so tail
    // entries (incomplete windows) become null and the final slice drops them.
    var acc = t
    for (k <- 1 until n) {
      val shifted = slice(t, lit(k + 1), greatest(size(t) - k, lit(0)))
      acc = zip_with(acc, shifted, (a, b) => concat(a, lit(" "), b))
    }
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(slice(acc, lit(1), size(t) - n + 1))
  }

  /** Number of word n-gram shingles WITHOUT assembling them: max(tokens −
    * n + 1, 0). `size(shingles(text, n))` computes the same value but pays
    * the whole zip_with assembly chain — and because shingle expressions
    * carry lambdas they are excluded from codegen CSE, so a query asking
    * for both the count and the shingles would assemble twice. */
  def shingleCount(text: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    greatest(tokenCount(text) - (n - 1), lit(0))
  }

  /** Distinct 64-bit shingle fingerprints (xxhash64 over each word n-gram) —
    * the compact per-document signature used by MinHash/SimHash dedup.
    * A document's set-similarity structure in 8 bytes per shingle. */
  def fingerprints(text: Column, n: Int): Column =
    array_distinct(transform(shingles(text, n), s => xxhash64(s)))

  /** Winnowed rolling-hash fingerprints (X36 — the MOSS local-fingerprinting
    * scheme of Schleimer, Wilkerson & Aiken, SIGMOD 2003): hash every word
    * k-gram, slide a window of `w` consecutive gram hashes, and select the
    * minimum of each window (rightmost on ties — the original paper's rule,
    * which maximizes cross-window selection overlap). Output is the distinct
    * `(pos, fp)` selection — `pos` is the 1-based gram index, so a match is
    * LOCALIZABLE, not just detectable.
    *
    * The winnowing guarantee: any shared token run of length ≥ w + k − 1
    * shares at least one selected fingerprint (spec-pinned), at an expected
    * density of 2/(w+1) of the gram count — the overlap join probes ~25%
    * of the grams at w = 7 instead of all of them, which is the whole point
    * at corpus scale. Documents with at least one gram but fewer than w get
    * ONE fingerprint (the global min) so short docs stay detectable.
    *
    * Gram hashes are md5-prefix (the [[graft.ops.Sampling]] convention), not
    * xxhash64, so the ENTIRE selection — values and positions — is
    * engine-replayable and sits under the DuckDB oracle. Pure map-only
    * column expression: fuses into the scan, shuffles nothing. */
  def winnowFingerprints(text: Column, k: Int, w: Int,
      seed: String = "winnow"): Column = {
    require(k >= 1, s"gram size must be >= 1, got $k")
    require(w >= 1, s"window size must be >= 1, got $w")
    val tk = tokens(text)
    val mg = size(tk) - (k - 1) // gram count, may be <= 0
    // sequence(1, 0) DESCENDS in Spark — guard the empty case explicitly
    val hs = when(mg <= 0, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), mg), i =>
        conv(substring(md5(concat(lit(seed + ":"),
          concat_ws(" ", slice(tk, i, lit(k))))), 1, 8), 16, 10).cast("long")))
    // windows 1..nw; a doc with 0 < grams < w is ONE short window (slice
    // past the end truncates, so the same expression covers both shapes)
    val nw = greatest(size(hs) - (w - 1), lit(1))
    val sel = when(size(hs) === 0,
        array().cast("array<struct<pos:bigint,fp:bigint>>"))
      .otherwise(transform(sequence(lit(1), nw), j => {
        val win = slice(hs, j, lit(w))
        val mn = array_min(win)
        // rightmost min = size − position of first min in the REVERSED window
        val pos = j - 1 + (size(win) + 1 - array_position(reverse(win), mn))
        struct(pos.cast("long").as("pos"), mn.as("fp"))
      }))
    array_distinct(sel)
  }

  /** TF-IDF over a document table: explode tokens, term frequency per
    * (doc, token), document frequency per token, smoothed idf =
    * ln(1 + N/df), tfidf = tf·idf. Two keyed shuffles (doc-token counts,
    * token doc-frequencies) with map-side partial aggregation — vocabulary-
    * sized state, corpus-scale safe. `docCount` is passed in when the caller
    * already knows it (table metadata); the no-count overload derives it
    * INSIDE the plan. Output: (id, token, tf, df, tfidf). */
  def tfIdf(docs: org.apache.spark.sql.DataFrame, id: String, text: String,
      docCount: Long): org.apache.spark.sql.DataFrame =
    finishTfIdf(tfParts(docs, id, text), id, lit(docCount.toDouble))

  /** TF-IDF with the document count computed in-plan: the N branch is a
    * column-pruned count aggregate (parquet answers it from row-group
    * metadata) cross-joined as a broadcast one-row frame AFTER the tf/df
    * aggregation — vocabulary-sized rows pick up the scalar, the token
    * explode and its shuffle never carry it, and there is no driver-side
    * `docs.count()` job before the query can even be declared. */
  def tfIdf(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String): org.apache.spark.sql.DataFrame = {
    val n = docs.groupBy().agg(count(lit(1)).cast("double").as("__N"))
    finishTfIdf(tfParts(docs, id, text).crossJoin(broadcast(n)), id, col("__N"))
  }

  private def tfParts(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(id), explode(tokens(col(text))).as("token"))
    val tf = toks.groupBy(col(id), col("token")).agg(count(lit(1)).as("tf"))
    // df derives from tf (one row per (doc, token) already) — a second
    // corpus scan + distinct shuffle would double the work for nothing
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(df, "token")
  }

  private def finishTfIdf(joined: org.apache.spark.sql.DataFrame, id: String,
      n: Column): org.apache.spark.sql.DataFrame =
    joined
      .withColumn("tfidf", round(col("tf") * log(lit(1.0) + n / col("df")), 6))
      .select(col(id), col("token"), col("tf"), col("df"), col("tfidf"))

  /** Sliding-window document chunking (the RAG/embedding-pipeline shape):
    * split each document into windows of `chunkTokens` tokens advancing by
    * `chunkTokens - overlap`. The chunk-index explode happens FIRST and the
    * window slice runs on the exploded row (per chunk, not per element —
    * rule 1 of COVERAGE.md's expression lessons). Map-side only: no shuffle.
    * Output: (id, chunk_idx, chunk_text, n_tokens). */
  def chunk(docs: org.apache.spark.sql.DataFrame, id: String, text: String,
      chunkTokens: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val n = size(col("toks"))
    val nChunks = when(n <= 0, lit(0))
      .otherwise(lit(1) + greatest(ceil((n - chunkTokens).cast("double") / stride), lit(0.0)).cast("int"))
    // guard: sequence(0, -1) is a DESCENDING sequence in Spark, not empty
    val chunkIdxs = when(nChunks <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nChunks - 1))
    docs
      .select(col(id), tokens(col(text)).as("toks"))
      .select(col(id), col("toks"), posexplode(chunkIdxs))
      .withColumnRenamed("pos", "chunk_idx")
      .select(col(id), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(n - col("chunk_idx") * stride, lit(chunkTokens)).as("n_tokens"))
  }

  /** Token-budget bin bucketing (pretraining batch construction): assign
    * documents, in id order, to bin `⌈cumTokens/maxTokens⌉ − 1` via a
    * running token total. This is prefix-sum BUCKETING, not greedy packing:
    * a document straddling a budget boundary lands in the later bin without
    * resetting the total, so a bin may exceed `maxTokens` by up to one
    * document (greedy first-fit is inherently sequential state — a
    * per-partition pass whose output depends on partitioning; the bucketing
    * form is deterministic at any parallelism, which matters more for
    * reproducible corpus builds).
    *
    * Computed as a TWO-PHASE PREFIX SUM, never a global window (a
    * partition-less `Window.orderBy` funnels the whole corpus through one
    * task — a single-executor bottleneck/OOM at scale):
    *   1. range-partition by id (partition i holds ids strictly below
    *      partition i+1's) and materialize, so both passes see one
    *      consistent partitioning;
    *   2. per-partition token totals — a tiny P-row aggregate collected to
    *      the driver, turned into cumulative start offsets per partition;
    *   3. running sum *within* each partition (window partitioned by the
    *      physical partition id — P-way parallel) plus the broadcast offset.
    * Identical bin assignment to the global-window formulation at any
    * parallelism. `id` values must be UNIQUE — "in id order" is only
    * well-defined then; duplicate ids would make the intra-partition tie
    * order (and so boundary-straddling bin assignments) run-dependent.
    * Output: (id, n_tokens, bin). */
  def packSequences(docs: org.apache.spark.sql.DataFrame, id: String, text: String,
      maxTokens: Long): org.apache.spark.sql.DataFrame =
    packSequencesByCount(docs, id, tokenCount(col(text)), maxTokens)

  /** [[packSequences]] with a caller-supplied TOKEN-COUNT column — the
    * rewiring that lets the packer spend real tokenizer tokens
    * ([[bpeTokenCount]]) instead of the whitespace proxy; any count
    * expression (or a pre-materialized column) drops in. Null counts
    * coalesce to 0: an uncoalesced null would ride the running sum
    * invisibly — packed free into its predecessor's bin. */
  def packSequencesByCount(docs: org.apache.spark.sql.DataFrame, id: String,
      nTokens: Column, maxTokens: Long): org.apache.spark.sql.DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val base = docs.select(col(id),
      coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"))
    cumSumByOrder(base, Seq(col(id)), "n_tokens", "cum")
      .withColumn("bin", ceil(col("cum").cast("double") / maxTokens).cast("long") - 1)
      .select(col(id), col("n_tokens"), col("bin"))
  }

  /** Corpus-wide running sum of `valueCol` in `order` — the two-phase
    * prefix sum shared by [[packSequences]] and [[selectUnderTokenBudget]]:
    *   1. range-partition by the order columns (partition i's rows sort
    *      strictly before partition i+1's) and materialize, so both passes
    *      see one consistent partitioning;
    *   2. per-partition totals — a tiny P-row aggregate collected to the
    *      driver (O(partitions), the one collect here), turned into
    *      cumulative start offsets;
    *   3. running sum *within* each partition (window partitioned by the
    *      physical partition id — P-way parallel) plus the broadcast offset.
    * Identical to a partition-less `Window.orderBy` running sum at any
    * parallelism, without funneling the corpus through one task. The order
    * must be TOTAL (tie-break on a unique id) — ties would make
    * boundary-straddling sums run-dependent. */
  private def cumSumByOrder(base: org.apache.spark.sql.DataFrame,
      order: Seq[Column], valueCol: String, outCol: String): org.apache.spark.sql.DataFrame = {
    // localCheckpoint pins the range partitioning: repartitionByRange samples
    // boundaries, and the totals pass and the final pass must agree on which
    // partition every row landed in.
    val ranked = base
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // coalesce(sum, 0): a partition whose values are ALL null (e.g. null-
    // text docs sorting together under a null score) must contribute 0 to
    // the offsets, not NPE the driver-side getLong
    val totals: Map[Int, Long] = ranked.groupBy("__pid")
      .agg(coalesce(sum(valueCol), lit(0L)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (totals.isEmpty) 0 else totals.keys.max
    val offsets: Seq[Long] =
      (0 to maxPid).map(p => totals.getOrElse(p, 0L)).scanLeft(0L)(_ + _).dropRight(1)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__pid"))
      .orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    ranked
      .withColumn(outCol,
        sum(col(valueCol)).over(w) + element_at(typedlit(offsets), col("__pid") + 1))
      .drop("__pid")
  }

  /** Data selection under a token budget (the "best documents until the
    * budget runs out" rule of quality-ranked corpus curation): rank the
    * corpus by `score` descending (ties broken on `id`), and keep the
    * maximal prefix whose cumulative token count stays ≤ `budget`. This is
    * prefix selection, not knapsack — the first document that would
    * overflow the budget is cut, and nothing after it is considered (the
    * deterministic, engine-replayable contract; a fill-the-gap heuristic
    * would depend on scan order).
    *
    * Scale shape: one range shuffle on (score, id) + the two-phase prefix
    * sum of [[cumSumByOrder]] — no single-task global window, no driver
    * materialization beyond the P-row partition totals.
    *
    * Output: (id, n_tokens, cum_tokens) of the selected rows. */
  def selectUnderTokenBudget(docs: org.apache.spark.sql.DataFrame, id: String,
      text: Column, score: Column, budget: Long): org.apache.spark.sql.DataFrame =
    selectUnderTokenBudgetByCount(docs, id, tokenCount(text), score, budget)

  /** [[selectUnderTokenBudget]] with a caller-supplied TOKEN-COUNT column —
    * budget in real tokenizer tokens ([[bpeTokenCount]]) or any other count
    * the caller already has. Null counts coalesce to 0: the doc is
    * selectable (costs nothing against the budget) rather than riding along
    * with a null count that the running sum would skip. */
  def selectUnderTokenBudgetByCount(docs: org.apache.spark.sql.DataFrame,
      id: String, nTokens: Column, score: Column,
      budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = docs.select(col(id), score.as("__score"),
      coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"))
    cumSumByOrder(base, Seq(col("__score").desc, col(id)), "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col(id), col("n_tokens"), col("cum_tokens"))
  }

  /** Per-group data selection under a token budget — [[selectUnderTokenBudget]]
    * with an independent budget per group (the per-SOURCE curation quota:
    * "at most B tokens from each domain/source/language", the mixture-
    * control rule that global budget selection can't express — one
    * high-quality source would eat the whole budget).
    *
    * Scale shape: ONE keyed window (partitioned by group, ordered by score
    * desc then id) — each group's running sum is a single task, LINEAR in
    * group size, and groups parallelize across the cluster; no global
    * window, no two-phase machinery needed. A pathologically hot group
    * degrades to one long task, not a failure (same caveat and remedy —
    * pre-cap — as `capGroupSize`).
    *
    * Output: (group, id, n_tokens, cum_tokens) of selected rows. */
  def selectUnderTokenBudgetPerGroup(docs: org.apache.spark.sql.DataFrame,
      id: String, group: String, text: Column, score: Column,
      budget: Long): org.apache.spark.sql.DataFrame =
    selectUnderTokenBudgetPerGroupByCount(docs, id, group, tokenCount(text),
      score, budget)

  /** [[selectUnderTokenBudgetPerGroup]] with a caller-supplied TOKEN-COUNT
    * column — per-source quotas spent in real tokenizer tokens
    * ([[bpeTokenCount]]) instead of the whitespace proxy. */
  def selectUnderTokenBudgetPerGroupByCount(docs: org.apache.spark.sql.DataFrame,
      id: String, group: String, nTokens: Column, score: Column,
      budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val reserved = Seq("n_tokens", "cum_tokens", "__score")
    require(!reserved.contains(id) && !reserved.contains(group),
      s"selectUnderTokenBudgetPerGroup reserves column names ${reserved.mkString(", ")}")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(group))
      .orderBy(col("__score").desc, col(id))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.select(col(group), col(id), score.as("__score"),
        coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("__score")
  }

  /** Text canonicalization for dedup keys — lowercase, punctuation → space,
    * whitespace collapsed and trimmed — so "Hello,  World!" and "hello
    * world" dedup together. Pure codegen'd regexp chain (map-only, fuses
    * into the scan); the patterns use only syntax common to Java regex and
    * RE2, same portability contract as [[scrubPii]]. Feed the result to
    * [[graft.dedup.Dedup.exactKeepFirst]] or [[shingles]] — canonicalizing
    * BEFORE fingerprinting is the standard first step of every dedup
    * pipeline (raw-byte dedup misses trivial formatting variants). */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(coalesce(text, lit(""))), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** PII scrubbing — the standard pre-training redaction pass: URLs, email
    * addresses and IPv4 literals replaced by stable placeholder tags. Pure
    * per-row regexp_replace chain (codegen'd, map-only, fused into the
    * scan). URL scrubbing runs FIRST so an address embedded in a URL query
    * string is consumed by the URL tag, not half-replaced. The patterns
    * deliberately use only syntax common to Java regex and RE2 (`\S`, `\d`,
    * `\b`, classes) so results are engine-portable. Real deployments layer
    * NER models on top; the regex tier is the cheap first 99%. */
  def scrubPii(text: Column): Column = {
    val url = regexp_replace(text, "https?://\\S+", "<URL>")
    val email = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  }

  /** X93 — PII pseudonymization with referential integrity: every email /
    * IPv4 literal is replaced by a STABLE tag derived from the value
    * itself (`<EMAIL:md5-prefix>`), so the same address maps to the same
    * token everywhere — unlike [[scrubPii]]'s blanket `<EMAIL>`, joins,
    * dedup keys, and per-user aggregates still work on the scrubbed
    * corpus (the published pseudonymization stance: GDPR art. 4(5)
    * reversibility-without-the-table, and the reason training-data
    * pipelines pseudonymize rather than redact when identity STRUCTURE
    * carries signal). The seed is the privacy key (the X64 contract):
    * re-identification needs the seed to rebuild the dictionary, and two
    * deployments with different seeds are unlinkable.
    *
    * Mechanics: per row, `regexp_extract_all` lists the matches, distinct
    * matches fold longest-first over the text with `replace` — longest
    * first because one match may be a proper substring of another
    * ("a@b.co" inside "xa@b.com"); replacing the longer one first makes
    * the shorter's global replace safe. Emails fold before IPs so a
    * dotted quad inside an email is consumed by the email's tag. The
    * fold is a higher-order `aggregate` — interpreted, not codegen'd
    * (the documented HOF trade); matches-per-row is small, so the
    * interpreted step is bounded per row. Map-only, no shuffle; NULL
    * text stays NULL. */
  def pseudonymizePii(text: Column, seed: String): Column = {
    require(seed.nonEmpty, "pseudonymizePii needs a non-empty seed — it is " +
      "the privacy key; an empty seed makes every deployment linkable")
    def fold(in: Column, re: String, tag: String): Column = {
      val ms = array_distinct(regexp_extract_all(in, lit(re), lit(0)))
      val longestFirst = reverse(array_sort(
        transform(ms, m => struct(length(m).as("l"), m.as("m")))))
      aggregate(longestFirst, in, (acc, s) =>
        replace(acc, s.getField("m"),
          concat(lit(s"<$tag:"),
            substring(md5(concat(lit(s"$seed:"), s.getField("m"))), 1, 8),
            lit(">"))))
    }
    fold(
      fold(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "EMAIL"),
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "IP")
  }

  /** Repetition statistics (the Gopher-style quality rule "fraction of
    * characters in the most common n-gram"): per document, the total and
    * top word-n-gram counts and the top fraction. High `top_frac` flags
    * boilerplate/spam (a page repeating one phrase). Two keyed shuffles —
    * (doc, gram) counts then per-doc rollup — both with map-side partial
    * aggregation, so shuffle state is distinct-gram-sized, never
    * corpus-sized. Documents with fewer than n tokens have no n-grams and
    * are absent. Output: (id, n_grams, top_count, top_frac). */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, n: Int): org.apache.spark.sql.DataFrame =
    docs
      .select(col(id), explode(shingles(col(text), n)).as("gram"))
      .groupBy(col(id), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(id))
      .agg(sum(col("c")).as("n_grams"), max(col("c")).as("top_count"))
      .select(col(id), col("n_grams"), col("top_count"),
        round(col("top_count").cast("double") / col("n_grams"), 6).as("top_frac"))

  /** Per-language marker-word profiles for [[langId]]. Tiny on purpose:
    * they broadcast as literals inside the expression tree. */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** Per-line language segmentation + mixed-language detection (X4's
    * code-switching face): [[langId]] applied line-by-line, re-aggregated
    * per document into `(id, n_lines, major_lang, major_frac, n_langs)` —
    * the signal that flags translation-pair pages, boilerplate-wrapped
    * foreign text, and code-switched documents that a whole-document
    * argmax silently mislabels as their majority language.
    *
    * Lines split on '\n'; lines blank after `[ \t]` edge-stripping are
    * dropped (never regex `\s` — Java/RE2 membership differs); a document
    * with NO non-blank lines emits no row. `major_lang` is the most
    * frequent line language, ties to the lexicographically first code
    * (min over (−count, lang) structs — the [[langId]] tie convention
    * lifted to the line level); `major_frac` is its share of non-blank
    * lines, round-6.
    *
    * Scale shape: explode is map-only fused into the scan; two keyed
    * shuffles, both carrying (doc, lang)-sized aggregates (≤ profiles per
    * doc), never lines. */
  def langIdByLine(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String,
      profiles: Seq[(String, Seq[String])] = defaultProfiles)
      : org.apache.spark.sql.DataFrame = {
    val counts = docs
      .select(col(id), explode(split(coalesce(col(text), lit("")), "\n")).as("line"))
      .filter(length(regexp_replace(col("line"), "^[ \t]+|[ \t]+$", "")) > 0)
      .select(col(id), langId(col("line"), profiles).as("line_lang"))
      .groupBy(col(id), col("line_lang"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col(id))
      .agg(
        sum(col("cnt")).as("n_lines"),
        min(struct((-col("cnt")).as("nc"), col("line_lang").as("lang"))).as("top"),
        countDistinct(col("line_lang")).as("n_langs"))
      .select(col(id), col("n_lines"),
        col("top.lang").as("major_lang"),
        round((-col("top.nc")).cast("double") / col("n_lines"), 6).as("major_frac"),
        col("n_langs").cast("int").as("n_langs"))
  }

  /** Dictionary-overlap language identification: score each language by the
    * number of tokens present in its marker list; highest score wins, ties
    * broken by language code order. Returns the language code. A real n-gram
    * model is a drop-in replacement (profile lists → n-gram weights); the
    * plumbing — pure per-row expression, no shuffle — is the point. */
  def langId(text: Column, profiles: Seq[(String, Seq[String])] = defaultProfiles): Column = {
    val t = tokens(lower(text))
    val sorted = profiles.sortBy(_._1)
    // argmax via array_max over (score, -index) structs: ties → max(-i) =
    // earliest language code. (A reduceLeft of when(cand > best, cand)
    // .otherwise(best) embeds the accumulated tree twice per step —
    // exponential expression growth, each copy re-tokenizing the text.)
    val scored = array(sorted.zipWithIndex.map { case ((_, words), i) =>
      struct(size(filter(t, w => w.isInCollection(words))).as("score"),
        lit(-i).as("ni"))
    }: _*)
    val best = array_max(scored)
    element_at(array(sorted.map(p => lit(p._1)): _*), -best.getField("ni") + 1)
  }

  /** X53 — per-source boilerplate template mining: the word-n-grams that
    * recur across MANY documents of the same source (site footers, cookie
    * banners, navigation chrome — the per-site boilerplate X1b's global
    * line dedup only removes when lines match exactly). Output: each
    * source's top `k` grams by document frequency, human-readable strings
    * (templates are for inspection and for seeding removal rules), ties
    * broken lexicographically.
    *
    * Scale shape: distinct grams per doc (row-local array ops) explode to
    * a (source, gram) stream → ONE partial-aggregated count (the df
    * frame) → `minDf` filter BEFORE the per-source window, which is the
    * step that makes the plan survive scale: the df frame is
    * corpus-vocabulary-sized, but boilerplate by definition has high df,
    * so the filter collapses it to the rare heavy tail and the top-k
    * window ranks a small frame. Deterministic (df desc, gram asc). */
  def templateGrams(docs: DataFrame, source: String, text: Column,
      n: Int = 5, minDf: Long = 3L, k: Int = 5): DataFrame = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    require(minDf >= 2, s"minDf below 2 mines singletons, got $minDf")
    require(k >= 1, s"k must be >= 1, got $k")
    val df = docs
      .select(col(source), explode(array_distinct(shingles(text, n))).as("gram"))
      .groupBy(col(source), col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(source)).orderBy(col("df").desc, col("gram"))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** X134 — deterministic readability scoring: Flesch reading ease and
    * Flesch-Kincaid grade (Flesch 1948; Kincaid et al. 1975) — the
    * audience-difficulty axis the X4 quality family (length / punct /
    * stopword ratios) and the Gopher rules don't capture, and a
    * standard curation feature ("keep grade-8-and-below for the
    * instruction mix"). Real syllabification needs a dictionary; the
    * STATED deterministic proxy is the classic vowel-group rule — a
    * word's syllables = its maximal `[aeiouyAEIOUY]+` runs, floored at
    * 1 — and sentences = maximal `[.!?]+` runs, floored at 1 (a
    * fragment is one sentence). With integer W/S/Y the scores are exact
    * FLOORED micros, replayable in any engine with the same two
    * regexes:
    *   flesch_micro = 206835000 − (1015000·W) DIV S − (84600000·Y) DIV W
    *   fk_grade_micro = (390000·W) DIV S + (11800000·Y) DIV W − 15590000
    * Zero-word texts (empty, NULL, whitespace) emit NULL scores with
    * zero counts — "unreadable" ≠ "hardest possible". Pure codegen'd
    * builtins (split / regexp_extract_all / aggregate), map-only, no
    * UDF, no shuffle.
    * Output: a struct `(words, sentences, syllables, flesch_micro,
    * fk_grade_micro)`. */
  def readability(text: Column): Column = {
    val ws = tokens(text)
    val words = size(ws)
    val sentences = greatest(lit(1),
      size(regexp_extract_all(coalesce(text, lit("")), lit("[.!?]+"), lit(0))))
    val syllables = aggregate(ws, lit(0L), (acc, w) =>
      acc + greatest(lit(1),
        size(regexp_extract_all(w, lit("[aeiouyAEIOUY]+"), lit(0)))))
    // exact integral division on non-negative longs without an expr
    // string: (a − a%b)/b is an exact multiple, so the double divide is
    // exact well inside 2^53 (operands here are ≤ ~1e11·tokens)
    def idiv(a: Column, b: Column): Column =
      ((a - a % b) / b).cast("long")
    struct(
      words.as("words"),
      when(words > 0, sentences).otherwise(lit(0)).as("sentences"),
      when(words > 0, syllables).otherwise(lit(0L)).as("syllables"),
      when(words > 0,
        lit(206835000L) -
          idiv(lit(1015000L) * words, sentences) -
          idiv(lit(84600000L) * syllables, words))
        .as("flesch_micro"),
      when(words > 0,
        idiv(lit(390000L) * words, sentences) +
          idiv(lit(11800000L) * syllables, words) -
          lit(15590000L))
        .as("fk_grade_micro"))
  }
}
