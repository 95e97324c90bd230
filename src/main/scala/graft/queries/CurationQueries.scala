package graft.queries

import graft.{Q, Tables}
import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The flagship LLM-data use case, end to end in ONE declarative plan:
  * corpus curation = quality scoring → language filter → near-dup
  * removal (MinHash-LSH, keep the lower doc_id of each verified pair).
  * This is the composition every piece of the text/dedup surface exists
  * for, and the whole thing stays a single Catalyst plan — scoring is
  * codegen'd scan work, the LSH join is bucketed, and the final
  * anti-join drops the duplicates without ever collecting anything.
  * The DuckDB oracle recomputes the identical pipeline.
  */
object CurationQueries {

  private def hitsSql(members: Seq[String]): String =
    s"len(list_filter(str_split(text, ' '), t -> t IN (${members.map("'" + _ + "'").mkString(",")})))"

  private val qualitySql =
    s"""0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 500.0)
       |    + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text))
       |    + 0.3 * least(1.0, CAST(${hitsSql(TextOps.Stopwords)} AS DOUBLE)
       |                         / len(str_split(text, ' ')) * 4.0)""".stripMargin

  private val langCaseSql: String = {
    val langs = TextOps.LangMarkers.map(_._1)
    val scores = TextOps.LangMarkers.map { case (l, m) =>
      s"CAST(${hitsSql(m)} AS DOUBLE) / len(str_split(text, ' ')) AS s_$l"
    }.mkString(", ")
    val cases = langs.init.map { l =>
      val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"(SELECT doc_id, text, quality, CASE $cases ELSE '${langs.last}' END AS pred_lang " +
      s"FROM (SELECT doc_id, text, $qualitySql AS quality, $scores FROM documents))"
  }

  val queries: Seq[Q] = Seq(
    Q(
      "corpus_curation",
      s"""WITH scored AS $langCaseSql,
         |kept AS (SELECT doc_id, text, quality FROM scored
         |         WHERE quality >= 0.6 AND pred_lang = 'en'),
         |tok AS (SELECT doc_id, str_split(text, ' ') AS w FROM kept),
         |sh AS (SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS shingles
         |       FROM tok),
         |sig AS (SELECT doc_id, shingles,
         |          list_transform(range(0, 12), i ->
         |            list_min(list_transform(shingles, s -> md5(i || ':' || s)))) AS sig
         |        FROM sh),
         |bands AS (SELECT doc_id, bs.b AS band,
         |            md5(sig[3*bs.b+1] || sig[3*bs.b+2] || sig[3*bs.b+3]) AS bh
         |          FROM sig, (SELECT unnest(range(0, 4)) AS b) bs),
         |sized AS (SELECT doc_id, band, bh,
         |            count(*) OVER (PARTITION BY band, bh) AS bsz FROM bands),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM sized a JOIN sized b
         |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |         WHERE a.bsz <= 64),
         |pairs AS (SELECT id_a, id_b FROM cand
         |          JOIN sh sa ON sa.doc_id = cand.id_a
         |          JOIN sh sb ON sb.doc_id = cand.id_b
         |          WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         |              / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.6)
         |SELECT k.doc_id, k.quality FROM kept k
         |LEFT JOIN (SELECT DISTINCT id_b FROM pairs) drop_ids ON k.doc_id = drop_ids.id_b
         |WHERE drop_ids.id_b IS NULL""".stripMargin) { (s, dir) =>
      val scored = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.langId(col("text")).as("pred_lang"))
      val kept = scored.filter(col("quality") >= 0.6 && col("pred_lang") === "en")
      val dropIds = Dedup.nearDupPairs(kept, "doc_id", "text", threshold = 0.6)
        .select(col("id_b").as("doc_id")).distinct()
      kept.join(dropIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("quality"))
    }.copy(bench = true))
}
