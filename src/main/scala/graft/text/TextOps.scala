package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-training-data surface (builder
  * brief: language-ID, quality scoring, token counting, document
  * fingerprinting). The reference has no text surface at all — its
  * closest analog is the per-record metadata extraction of the MP4
  * pipeline (images/mp4/process_mp4.sh:5-7), which §2.6 X4 maps to
  * "extract structured signal per record". These operators are that idea
  * applied to text columns.
  *
  * Every operator is a pure Column composition over built-ins
  * (split/filter/transform/aggregate/regexp) — codegen'd, no UDFs, no
  * shuffle. At 100 TB they run at parquet-scan speed and the derived
  * columns (lang, quality) become partition/clustering keys for the
  * downstream pipeline. All are DuckDB-oracle-expressible so the driver
  * hash-checks every value.
  */
object TextOps {

  /** Whitespace tokens. The fixture corpus is single-space separated;
    * a production corpus would normalize whitespace first
    * (regexp_replace(text, "\\s+", " ")). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the standard cheap
    * proxy for byte-pair-encoded token counts when no tokenizer model
    * is shippable. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  /** English stopword sample used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "is", "in", "it", "for", "on")

  /** Marker-word lists for the n-gram/stopword language-ID heuristic.
    * Order matters: ties resolve to the earliest entry, so the list IS
    * the tie-break priority. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3"))

  /** All member lists the scoring surface needs, in stat order:
    * stats = [n_tokens, stopword_hits, en_hits, es_hits, fr_hits,
    * de_hits, zh_hits]. */
  val StatLists: Seq[Seq[String]] = Stopwords +: LangMarkers.map(_._2)

  /** ONE fused tokenize-and-count pass per document (native codegen
    * kernel graft.functions.TokenMemberCounts — the round-2 interpreted
    * `filter` HOF walked the token array ~31× per document and was 67%
    * of the bench). Every ratio/score below is arithmetic over elements
    * of this array; within one projection, identical tokenStats trees
    * are a single common subexpression. Requires
    * GraftFunctions.register (done by Tables.load). */
  def tokenStats(text: Column): Column =
    graft.functions.GraftFunctions.tokenHits(text, StatLists)

  private def nTokens(stats: Column): Column = element_at(stats, 1)
  private def stopHits(stats: Column): Column = element_at(stats, 2)
  private def langHits(stats: Column, langIdx: Int): Column = element_at(stats, 3 + langIdx)

  /** Occurrences of any `members` element among the whitespace tokens. */
  def memberHits(text: Column, members: Seq[String]): Column =
    element_at(graft.functions.GraftFunctions.tokenHits(text, Seq(members)), 2)

  def stopwordRatioFrom(stats: Column): Column =
    stopHits(stats).cast("double") / nTokens(stats)

  def stopwordRatio(text: Column): Column = stopwordRatioFrom(tokenStats(text))

  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9 ]"), lit(0))).cast("double") /
      length(text)

  def avgWordLenFrom(text: Column, stats: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / nTokens(stats)

  def avgWordLen(text: Column): Column = avgWordLenFrom(text, tokenStats(text))

  /** Composite quality score in [0,1]: length saturation + low
    * punctuation + natural-language stopword density — the standard
    * heuristic trio for pretraining-corpus filtering. */
  def qualityScoreFrom(text: Column, stats: Column): Column =
    lit(0.4) * least(lit(1.0), length(text).cast("double") / 500.0) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.3) * least(lit(1.0), stopwordRatioFrom(stats) * 4.0)

  def qualityScore(text: Column): Column = qualityScoreFrom(text, tokenStats(text))

  /** Literal stand-ins for trained parameters — the seam a
    * fastText/DCLM-style learned quality filter plugs into (swap the
    * constants for fitted weights; the plan shape is identical). Order:
    * bias, length-saturation, punctuation, stopword-density,
    * duplicate-bigram-fraction. */
  val QualityModelWeights: (Double, Double, Double, Double, Double) =
    (-1.0, 2.0, -3.0, 2.0, -5.0)

  /** Model-based quality: logistic over the same kernel features the
    * heuristic score uses — score = σ(b + Σ wᵢfᵢ), still one fused
    * tokenize pass per document plus scan-side arithmetic, so the
    * "classifier" costs the same as the heuristic at any scale. All
    * f64 with a fixed evaluation order; the oracle recomputes the
    * identical expression (exp() differences are below the compare's
    * rounding). */
  def qualityModelScore(text: Column): Column = {
    val (b, wLen, wPunct, wStop, wDup) = QualityModelWeights
    val stats = tokenStats(text)
    val z = lit(b) +
      lit(wLen) * least(lit(1.0), length(text).cast("double") / 500.0) +
      lit(wPunct) * punctRatio(text) +
      lit(wStop) * least(lit(1.0), stopwordRatioFrom(stats) * 4.0) +
      lit(wDup) * duplicateNgramFraction(text)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  def langScoreFrom(stats: Column, langIdx: Int): Column =
    langHits(stats, langIdx).cast("double") / nTokens(stats)

  def langScore(text: Column, markers: Seq[String]): Column = {
    val idx = LangMarkers.indexWhere(_._2 == markers)
    require(idx >= 0, "langScore markers must be one of LangMarkers")
    langScoreFrom(tokenStats(text), idx)
  }

  /** Predicted language = argmax marker score, ties to the earlier
    * entry in LangMarkers (deterministic CASE chain — identical shape
    * in the DuckDB oracle). */
  def langIdFrom(stats: Column): Column = {
    val scores = LangMarkers.zipWithIndex.map { case ((l, _), i) => l -> langScoreFrom(stats, i) }
    scores.init.foldRight(lit(scores.last._1)) { case ((l, s), rest) =>
      val notBeaten = scores.filter(_._1 != l)
        .map(_._2).foldLeft(lit(true))((acc, o) => acc && s >= o)
      when(notBeaten, l).otherwise(rest)
    }
  }

  def langId(text: Column): Column = langIdFrom(tokenStats(text))

  /** `[total_ngram_occurrences, distinct_ngrams]` in one kernel pass
    * (graft.functions.ShingleStats). */
  def shingleStats(text: Column, n: Int = 2): Column =
    graft.functions.GraftFunctions.shingleStats(text, n)

  /** Within-document repetition: the fraction of n-gram OCCURRENCES
    * that are repeats of an earlier n-gram (1 − distinct/total) — the
    * Gopher-style duplicate-n-gram quality filter. 0.0 for docs with
    * fewer than n tokens. */
  def duplicateNgramFraction(text: Column, n: Int = 2): Column = {
    val st = shingleStats(text, n)
    val total = element_at(st, 1)
    when(total > 0,
      lit(1.0) - element_at(st, 2).cast("double") / total)
      .otherwise(lit(0.0))
  }

  /** Contact/link pattern counts — the C4-style signals for PII
    * scrubbing and boilerplate detection. Patterns stay inside the
    * RE2-compatible subset so the DuckDB oracle recomputes them
    * identically (no backreferences, no lookaround). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ ]+"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")

  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlPattern), lit(0))).cast("long")

  /** Canonical text normalization, the C4-style cleanup that runs
    * before any tokenization or hashing: Unicode NFC (combining
    * sequences composed, so 'e'+U+0301 and 'é' dedup/tokenize
    * identically — the graft_nfc kernel), control characters to
    * spaces, space runs collapsed, ends trimmed. Application ORDER is
    * part of the semantics and the oracle applies the same order.
    * Regex classes are spelled as explicit byte ranges (not \\s or
    * \\p{Cntrl}) because Java regex and DuckDB's RE2 disagree on the
    * shorthands' exact membership (e.g. \\x0B). */
  def normalize(text: Column): Column = {
    val composed = graft.functions.GraftFunctions.nfc(text)
    val noCtrl = regexp_replace(composed, "[\\x00-\\x1F\\x7F]", " ")
    trim(regexp_replace(noCtrl, " {2,}", " "))
  }

  /** PII/boilerplate redaction: every email, then every URL, replaced
    * by a typed placeholder token. Application ORDER is part of the
    * semantics (an email inside a URL's userinfo is redacted before the
    * URL pattern sees it) — the oracle applies the same order. Pure
    * codegen'd regexp_replace: a scan-side transform at any scale. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
      lit(UrlPattern), lit("<URL>"))

  /** Document fingerprint: the minimum md5 over the sliding char
    * 8-grams (winnowing-style rolling-hash fingerprint, robust to
    * local edits), alongside md5(text) as the exact fingerprint. */
  def rollingFingerprint(text: Column, k: Int = 8): Column =
    graft.functions.GraftFunctions.rollingFp(text, k)

  /** Composed REFERENCE form of the rolling fingerprint — the
    * interpreted O(len) per-window-lambda pipeline the native kernel
    * replaced (round-16: ~2 s of the sweep in one query); the
    * KernelPropertySpec equivalence pin executes this. */
  def rollingFingerprintComposed(text: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k)))))

  def exactFingerprint(text: Column): Column = md5(text)

  /** Markup stripping (HTML/XML → text): the boilerplate-removal stage
    * between a web crawl and every text operator above. Script and
    * style blocks go CONTENT AND ALL (their bodies are code, not
    * prose); remaining tags become spaces; the five predefined
    * entities plus nbsp/#39 decode — `&amp;` LAST, the standard order
    * that keeps `&amp;lt;` from double-decoding into a phantom `<`;
    * whitespace collapses. Application order is part of the semantics
    * and the oracle mirrors it step for step. Pure codegen'd
    * regexp/replace chain — a scan-side transform at any scale.
    * Lossy by design on text that uses bare `<`/`>` as prose (same
    * trade every tag stripper makes); RE2-compatible patterns (no
    * backreferences — script and style get separate passes). */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** URL canonicalization: the identity key for web-corpus dedup —
    * crawls see the same page under case-varied hosts, default ports,
    * tracking params in shuffled order, and fragments; dedup by raw
    * string misses them all. Steps (order is the semantics, oracle
    * mirrors): drop fragment; lowercase scheme and host; strip the
    * scheme's default port (:443 https, :80 http); strip the path's
    * trailing slash (root stays bare); drop `utm_*` tracking params;
    * sort surviving params. Built-in split/filter/sort_array column
    * ops — the array HOFs run per URL, not per corpus row of anything
    * larger, and a scan-side transform at any scale. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = split(url, "#").getItem(0)
    val base = split(noFrag, "\\?").getItem(0)
    val query = when(noFrag.contains("?"),
      regexp_replace(noFrag, "^[^?]*\\?", "")).otherwise(lit(""))
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1))
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    val path = when(rawPath === "" || rawPath === "/", lit(""))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val params = array_join(
      sort_array(filter(split(query, "&"),
        p => p =!= "" && !p.startsWith("utm_"))), "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }
}
