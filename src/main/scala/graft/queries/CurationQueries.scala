package graft.queries

import graft.{Q, Tables}
import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The flagship LLM-data use case, end to end in ONE declarative plan:
  * corpus curation = quality scoring → language filter → repetition
  * filter (Gopher-style duplicate-bigram fraction) → near-dup removal
  * (MinHash-LSH, keep the lower doc_id of each verified pair).
  * This is the composition every piece of the text/dedup surface exists
  * for, and the whole thing stays a single Catalyst plan — scoring is
  * codegen'd scan work, the LSH join is bucketed, and the final
  * anti-join drops the duplicates without ever collecting anything.
  * The DuckDB oracle recomputes the identical pipeline.
  */
object CurationQueries {

  /** Shared oracle snippets (OracleSnippets) assembled into the scored
    * corpus: ONE SQL rendering of quality + lang-ID, same as
    * text_quality / text_lang_id. */
  private val scoredSql: String =
    s"(SELECT doc_id, text, quality, ${OracleSnippets.langCaseSql} AS pred_lang " +
      s"FROM (SELECT doc_id, text, ${OracleSnippets.qualitySql} AS quality, " +
      s"${OracleSnippets.langScoresSql} FROM documents))"

  val queries: Seq[Q] = Seq(
    Q(
      "corpus_curation",
      s"""WITH scored AS $scoredSql,
         |corpus AS (SELECT doc_id, text FROM scored
         |           WHERE quality >= 0.6 AND pred_lang = 'en'
         |             AND ${OracleSnippets.dupFractionSql} < 0.08),
         |kept AS (SELECT c.doc_id, sc.quality FROM corpus c
         |         JOIN scored sc ON sc.doc_id = c.doc_id),
         |${OracleSnippets.minhashLshPairsCte}
         |SELECT k.doc_id, k.quality FROM kept k
         |LEFT JOIN (SELECT DISTINCT id_b FROM pairs WHERE jaccard >= 0.6) drop_ids
         |  ON k.doc_id = drop_ids.id_b
         |WHERE drop_ids.id_b IS NULL""".stripMargin) { (s, dir) =>
      val scored = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.langId(col("text")).as("pred_lang"))
      // repetition threshold 0.08: the fixture corpus's natural
      // duplicate-bigram fraction tops out ≈0.10 (median 0.03), so the
      // filter drops a real high-repetition tail without gutting the
      // corpus — production pipelines tune this per-source
      val kept = scored.filter(col("quality") >= 0.6 && col("pred_lang") === "en" &&
        TextOps.duplicateNgramFraction(col("text")) < 0.08)
      val dropIds = Dedup.nearDupPairs(kept, "doc_id", "text", threshold = 0.6)
        .select(col("id_b").as("doc_id")).distinct()
      kept.join(dropIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("quality"))
    }.copy(bench = true))
}
