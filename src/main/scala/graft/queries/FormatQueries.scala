package graft.queries

import graft.{Q, Tables}
import graft.sources.Formats
import org.apache.spark.sql.functions._

/** Oracle-checked round-trips for the csv/json structured formats: the
  * Spark side writes `documents` out in the format, reads it back
  * schema-explicit, and aggregates; the oracle aggregates the original
  * parquet. Any loss in quoting/escaping/typing breaks the hash match.
  */
object FormatQueries {

  private val aggSql =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS total_len
      |FROM documents GROUP BY lang""".stripMargin

  private def roundTripAgg(format: String, options: Map[String, String]) =
    (s: org.apache.spark.sql.SparkSession, dir: String) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_fmt/${format}_docs"
      Formats.roundTrip(Tables.load(s, dir, "documents"), format, tmp, options)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          sum(length(col("text"))).as("total_len"))
    }

  val queries: Seq[Q] = Seq(
    Q("format_csv_roundtrip", aggSql)(roundTripAgg("csv", Formats.csvOptions)),
    Q("format_json_roundtrip", aggSql)(roundTripAgg("json", Map.empty)),
    // ORC: the columnar alternative bundled with spark-sql (avro's
    // connector jar isn't on the fixed classpath, so orc is the second
    // columnar format alongside parquet)
    Q("format_orc_roundtrip", aggSql)(roundTripAgg("orc", Map.empty)),
    // XML: built into spark-sql since Spark 4 (the spark-xml merge) —
    // the interchange format enterprise feeds still arrive in; entity
    // escaping of arbitrary document text is exactly what the value
    // check exercises
    Q("format_xml_roundtrip", aggSql)(
      roundTripAgg("xml", Map("rowTag" -> "doc"))),

    // ── Hive-partitioned layout: documents written one directory per
    // lang, read back with a lang filter — the scan must prune to the
    // en/ directory alone (PartitionFilters, pinned by PlanAuditSpec).
    // The oracle aggregates the original table under the same filter,
    // so a partition/row mismatch in the layout breaks the hash. ──────
    Q(
      "format_partitioned_roundtrip",
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang = 'en' GROUP BY source""".stripMargin) { (s, dir) =>
      Formats.partitionedRoundTrip(
          Tables.load(s, dir, "documents"), s"$dir/documents.parquet",
          s"${System.getProperty("java.io.tmpdir")}/graft_fmt_part", "lang")
        .filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
    })
}
