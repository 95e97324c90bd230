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

  val queries: Seq[Q] = Seq(

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
    })
}
