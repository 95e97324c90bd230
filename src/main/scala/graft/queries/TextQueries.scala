package graft.queries

import graft.{Q, Tables}
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the text-analysis operators (builder
  * brief: token counting, quality scoring, language-ID, document
  * fingerprinting) over the `documents` fixture. The DuckDB oracle
  * recomputes every derived value independently, so these are full
  * value-level checks, not shape checks.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  import OracleSnippets.hitsSql

  /** The deterministic HTML wrapper both engines build around each
    * fixture document for the markup-strip check — covers script/style
    * content exclusion, attribute-carrying and self-closing tags,
    * every decoded entity, and the &amp;lt; double-decode trap. */
  private val WrapSqlExpr =
    """'<html><body onload="load()"><h1>Doc ' || doc_id || '</h1><p>' || text ||
      |'</p><script type="text/x">var t = "<p>not text</p>";</script>' ||
      |'<style>p { color: red }</style><br/>&quot;fin&#39;&quot; &amp;lt;tag&amp;gt; &amp;&nbsp;done</body></html>'"""
      .stripMargin.replace("\n", "")

  val queries: Seq[Q] = Seq(

    // ── Markup stripping: HTML/XML → text, the boilerplate-removal
    // stage between a crawl and every other text operator. The engine
    // and the oracle wrap each document in the same deterministic
    // markup, then strip independently — script/style bodies must
    // vanish, entities decode (&amp; last), whitespace collapses. ─────
    Q(
      "text_strip_markup",
      s"""WITH wrapped AS (SELECT doc_id, $WrapSqlExpr AS html FROM documents),
         |s1 AS (SELECT doc_id,
         |         regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t
         |       FROM wrapped),
         |s2 AS (SELECT doc_id,
         |         regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]+>', ' ', 'g') AS t FROM s2),
         |s4 AS (SELECT doc_id,
         |         replace(replace(replace(replace(replace(replace(t,
         |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |           '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
         |       FROM s3)
         |SELECT doc_id,
         |  trim(regexp_replace(t, '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS clean_text
         |FROM s4""".stripMargin) { (s, dir) =>
      val html = concat(
        lit("""<html><body onload="load()"><h1>Doc """), col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("""</p><script type="text/x">var t = "<p>not text</p>";</script>"""),
        lit("""<style>p { color: red }</style><br/>&quot;fin&#39;&quot; &amp;lt;tag&amp;gt; &amp;&nbsp;done</body></html>"""))
      docs(s, dir).select(col("doc_id"),
        TextOps.stripMarkup(html).as("clean_text"))
    },

    // ── URL canonicalization: the identity key web-corpus dedup joins
    // on. The fixture text carries no URLs, so both engines derive the
    // same messy synthetic URL per document (case-varied host, default
    // port, shuffled params, utm_ tracking, fragment) and normalize
    // independently — every canonical string value-checked. ────────────
    Q(
      "text_url_normalize",
      """WITH u AS (SELECT doc_id,
        |    'HTTPS://WWW.' || source || '.Example.COM:443/Docs/' || doc_id ||
        |    '/?utm_source=feed&z=' || lang || '&utm_campaign=x&b=2&a=1#sec-' || doc_id AS url
        |  FROM documents),
        |n AS (SELECT doc_id, str_split(url, '#')[1] AS nofrag FROM u),
        |p AS (SELECT doc_id, str_split(nofrag, '?')[1] AS base,
        |        CASE WHEN contains(nofrag, '?')
        |             THEN regexp_replace(nofrag, '^[^?]*\?', '') ELSE '' END AS query
        |      FROM n),
        |parts AS (SELECT doc_id,
        |    lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)', 1)) AS hostport,
        |    regexp_replace(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', '') AS rawpath,
        |    query
        |  FROM p),
        |norm AS (SELECT doc_id, scheme,
        |    CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |         WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |         ELSE hostport END AS host,
        |    CASE WHEN rawpath IN ('', '/') THEN ''
        |         ELSE regexp_replace(rawpath, '/$', '') END AS path,
        |    array_to_string(list_sort(list_filter(str_split(query, '&'),
        |      x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS params
        |  FROM parts)
        |SELECT doc_id, scheme || '://' || host || path ||
        |  CASE WHEN params = '' THEN '' ELSE '?' || params END AS canonical_url
        |FROM norm""".stripMargin) { (s, dir) =>
      val url = concat(
        lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/Docs/"),
        col("doc_id").cast("string"), lit("/?utm_source=feed&z="), col("lang"),
        lit("&utm_campaign=x&b=2&a=1#sec-"), col("doc_id").cast("string"))
      docs(s, dir).select(col("doc_id"),
        TextOps.normalizeUrl(url).as("canonical_url"))
    },

    // ── Token counting: whitespace + BPE-ish regex (brief: text analysis)
    Q(
      "text_token_counts",
      """SELECT doc_id,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_ws_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"))
    },

    // ── Quality scoring: length/punct/stopword composite ───────────────
    Q(
      "text_quality",
      s"""SELECT doc_id,
         |  CAST(${hitsSql(TextOps.Stopwords)} AS DOUBLE)
         |    / len(str_split(text, ' ')) AS stop_ratio,
         |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
         |    / length(text) AS punct_ratio,
         |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
         |    / len(str_split(text, ' ')) AS avg_word_len,
         |  ${OracleSnippets.qualitySql} AS quality
         |FROM documents""".stripMargin) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextOps.stopwordRatio(col("text")).as("stop_ratio"),
        TextOps.punctRatio(col("text")).as("punct_ratio"),
        TextOps.avgWordLen(col("text")).as("avg_word_len"),
        TextOps.qualityScore(col("text")).as("quality"))
    }.copy(bench = true),

    // ── Language-ID: marker-score argmax with deterministic tie-break ──
    Q(
      "text_lang_id",
      s"""SELECT doc_id, lang, s_en, s_es,
         |  ${OracleSnippets.langCaseSql} AS pred_lang
         |FROM (SELECT doc_id, lang, ${OracleSnippets.langScoresSql} FROM documents)""".stripMargin) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"), col("lang"),
        TextOps.langScore(col("text"), TextOps.LangMarkers.head._2).as("s_en"),
        TextOps.langScore(col("text"), TextOps.LangMarkers(1)._2).as("s_es"),
        TextOps.langId(col("text")).as("pred_lang"))
    },

    // ── Fingerprinting: exact md5 + rolling-hash winnowing min ─────────
    Q(
      "text_fingerprint",
      """SELECT doc_id,
        |  md5(text) AS exact_fp,
        |  list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
        |    i -> md5(substring(text, i, 8)))) AS rolling_fp
        |FROM documents""".stripMargin) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextOps.exactFingerprint(col("text")).as("exact_fp"),
        TextOps.rollingFingerprint(col("text")).as("rolling_fp"))
    },

    // ── Within-document repetition (Gopher-style duplicate-n-gram
    // fraction). The fixture corpus carries natural bigram repeats;
    // self-concatenated mutants are planted for a strong high-repetition
    // signal (dup_fraction ≈ 0.5), identically on both engines. ────────
    Q(
      "text_repetition",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 300000, text || ' ' || text
        |  FROM documents WHERE doc_id < 25),
        |tok AS (SELECT doc_id, str_split(text, ' ') AS w FROM corpus),
        |st AS (SELECT doc_id,
        |         greatest(len(w) - 1, 0) AS total,
        |         CASE WHEN len(w) >= 2 THEN
        |           len(list_distinct(list_transform(range(1, len(w)),
        |             i -> w[i] || ' ' || w[i+1])))
        |         ELSE 0 END AS dist
        |       FROM tok)
        |SELECT doc_id,
        |  CAST(total AS BIGINT) AS total_ngrams,
        |  CAST(dist AS BIGINT) AS distinct_ngrams,
        |  CASE WHEN total > 0 THEN 1.0 - CAST(dist AS DOUBLE) / total
        |       ELSE 0.0 END AS dup_fraction
        |FROM st""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionAll(d.filter(col("doc_id") < 25)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat_ws(" ", col("text"), col("text")).as("text")))
      val st = TextOps.shingleStats(col("text"))
      corpus.select(
        col("doc_id"),
        element_at(st, 1).as("total_ngrams"),
        element_at(st, 2).as("distinct_ngrams"),
        TextOps.duplicateNgramFraction(col("text")).as("dup_fraction"))
    },

    // ── Contact/link pattern counts (C4-style PII & boilerplate
    // signals). The fixture has no emails/URLs, so mutants with one of
    // each are planted identically on both engines. ────────────────────
    Q(
      "text_patterns",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 400000,
        |         text || ' contact user' || doc_id ||
        |         '@example.com or https://example.org/doc/' || doc_id
        |  FROM documents WHERE doc_id < 25)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS n_urls
        |FROM corpus""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionAll(d.filter(col("doc_id") < 25)
        .select((col("doc_id") + 400000).as("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or https://example.org/doc/"), col("doc_id")).as("text")))
      corpus.select(
        col("doc_id"),
        TextOps.emailCount(col("text")).as("n_emails"),
        TextOps.urlCount(col("text")).as("n_urls"))
    },

    // ── PII redaction: emails then URLs → typed placeholders, same
    // planted corpus as text_patterns so the replacements actually
    // fire; the oracle hash-checks every redacted string. ─────────────
    Q(
      "text_redact",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 400000,
         |         text || ' contact user' || doc_id ||
         |         '@example.com or https://example.org/doc/' || doc_id
         |  FROM documents WHERE doc_id < 25)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(text,
         |    '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
         |    '${TextOps.UrlPattern}', '<URL>', 'g') AS redacted
         |FROM corpus""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionAll(d.filter(col("doc_id") < 25)
        .select((col("doc_id") + 400000).as("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or https://example.org/doc/"), col("doc_id")).as("text")))
      corpus.select(col("doc_id"), TextOps.redact(col("text")).as("redacted"))
    },

    // ── Canonical normalization: NFC (the graft_nfc kernel) + control
    // chars → spaces + space-run collapse + trim. Planted mutants carry
    // a combining acute (U+0301), a tab, a BEL, and space runs, so
    // every branch fires; the oracle (DuckDB nfc_normalize implements
    // the same UAX#15 composition) hash-checks every normalized string
    // and the char counts pin that both engines count code points. ────
    Q(
      "text_normalize",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 600000,
         |         'Cafe' || chr(769) || '  du' || chr(9) || 'monde' || chr(7) || ' ' || text || '  '
         |  FROM documents WHERE doc_id < 30),
         |n AS (SELECT doc_id, text,
         |        trim(regexp_replace(regexp_replace(nfc_normalize(text),
         |          '[\\x00-\\x1F\\x7F]', ' ', 'g'), ' {2,}', ' ', 'g')) AS norm
         |      FROM corpus)
         |SELECT doc_id, norm,
         |       CAST(length(text) AS BIGINT) AS orig_chars,
         |       CAST(length(norm) AS BIGINT) AS norm_chars
         |FROM n""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionAll(d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(lit("Café  du\tmonde "), col("text"), lit("  ")).as("text")))
      corpus
        .select(col("doc_id"), col("text"), TextOps.normalize(col("text")).as("norm"))
        .select(col("doc_id"), col("norm"),
          length(col("text")).cast("long").as("orig_chars"),
          length(col("norm")).cast("long").as("norm_chars"))
    },

    // ── Model-based quality: logistic over the kernel features (the
    // learned-filter seam — literal weights stand in for trained
    // ones). Same single tokenize pass as the heuristic; per-document
    // scores hash-checked, plus the ≥0.5 keep decision. ───────────────
    Q(
      "text_quality_model",
      s"""WITH f AS (
         |  SELECT doc_id,
         |         -1.0 +
         |         2.0 * least(1.0, CAST(length(text) AS DOUBLE) / 500.0) +
         |         (-3.0) * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text)) +
         |         2.0 * least(1.0, CAST(${OracleSnippets.hitsSql(TextOps.Stopwords)} AS DOUBLE)
         |                            / len(str_split(text, ' ')) * 4.0) +
         |         (-5.0) * ${OracleSnippets.dupFractionSql} AS z
         |  FROM documents)
         |SELECT doc_id,
         |       1.0 / (1.0 + exp(-z)) AS model_score,
         |       CAST(CASE WHEN 1.0 / (1.0 + exp(-z)) >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM f""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextOps.qualityModelScore(col("text")).as("model_score"))
        .select(col("doc_id"), col("model_score"),
          when(col("model_score") >= 0.5, 1L).otherwise(0L).as("keep"))
    })
}
