package graft.queries

import graft.{Q, Tables}
import graft.ingest.{FixtureTree, Filters, Ingest}
import graft.store.Store
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the ingest job (SURVEY.md §2.1/2.2/2.4/2.5:
  * S1, F1–F5, D1, A1, A2).
  *
  * The scan/filter/dedup queries run the REAL ingest code over the
  * deterministic fixture tree (FIXTURES.md §2) and the oracle pins the
  * expected resource rows as constants — including sha256 digests the
  * oracle recomputes itself. The filter-semantics queries run the
  * compiled predicates over parquet-synthesized URLs so DuckDB's regex
  * engine independently re-derives every match decision.
  */
object IngestOps {

  private val B = FixtureTree.root // /tmp/graft_bucket

  /** Deterministic synthetic URL per part row (shared shape with
    * PipelineOps so filter coverage spans the same corners). */
  private def partUrls(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .withColumn("url",
        concat(lit("s3://data/media/"), col("p_brand"), lit("/"), col("p_partkey"),
          expr("CASE pmod(p_partkey, 5) WHEN 0 THEN '.mov' WHEN 1 THEN '.MOV' " +
            "WHEN 2 THEN '.mp4' WHEN 3 THEN '.txt' ELSE '' END")))

  private val partUrlSql =
    """concat('s3://data/media/', p_brand, '/', p_partkey,
      |  CASE (p_partkey % 5) WHEN 0 THEN '.mov' WHEN 1 THEN '.MOV'
      |       WHEN 2 THEN '.mp4' WHEN 3 THEN '.txt' ELSE '' END)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── S1+F1: depth-bounded recursive scan with ext filter ─────────────
    // Expected: the four .mov/.MOV files across depths 2–4; .mp4/.txt/
    // no-extension excluded; matching is case-insensitive on the full URL.
    Q(
      "s1_ingest_ext_scan",
      s"""SELECT key, CAST(size AS BIGINT) AS size,
         |       sha256('file://$B/' || key) AS hash
         |FROM (VALUES
         |  ('video/a.MOV', 11), ('video/b.mov', 11),
         |  ('video/deep/d.mov', 16), ('video/deep/deeper/e.mov', 23)
         |) t(key, size)""".stripMargin) { (s, _) =>
      FixtureTree.ensure()
      Ingest.scan(s, B, "ext/mov", depth = 4)
        .select(col("key"), col("size"), col("hash"))
    },

    // ── S1: recursion bound honored (depth 2 stops above deep/) ─────────
    Q(
      "s1_ingest_depth_bound",
      """SELECT key FROM (VALUES
        |  ('video/a.MOV'), ('video/b.mov'), ('video/c.mp4'),
        |  ('video/noext'), ('docs/readme.txt')) t(key)""".stripMargin) { (s, _) =>
      FixtureTree.ensure()
      Ingest.scan(s, B, "identity", depth = 2).select(col("key"))
    },

    // ── D1+A1: ingest twice — second run adds nothing (SADD semantics) ──
    Q(
      "d1_ingest_idempotent",
      "SELECT CAST(4 AS BIGINT) AS n_first, CAST(4 AS BIGINT) AS n_second") { (s, _) =>
      FixtureTree.ensure()
      val store = Store("/tmp/graft_state/ingest_idem")
      Store.delete(s, store.resourceIndex)
      val first = Ingest.run(s, B, "ext/mov", depth = 4, store)
      val second = Ingest.run(s, B, "ext/mov", depth = 4, store)
      import s.implicits._
      Seq((first, second)).toDF("n_first", "n_second")
    },

    // ── F1/F3: ext-filter semantics cross-checked against DuckDB regex ──
    Q(
      "f1_ext_filter_semantics",
      s"""SELECT url,
         |  regexp_matches(lower(url), '^(.+)\\.mov$$') AS is_mov,
         |  (regexp_matches(lower(url), '^(.+)\\.mov$$')
         |   OR regexp_matches(lower(url), '^(.+)\\.mp4$$')) AS is_media
         |FROM (SELECT $partUrlSql AS url FROM part)""".stripMargin) { (s, dir) =>
      partUrls(s, dir).select(
        col("url"),
        Filters.compile("ext/mov", col("url")).as("is_mov"),
        Filters.compile("ext/mov/mp4", col("url")).as("is_media"))
    },

    // ── F5: prefix-vs-object test (key ends in '/') ─────────────────────
    Q(
      "f5_prefix_test",
      """SELECT key, (key LIKE '%/') AS is_prefix
        |FROM (SELECT p_brand ||
        |        CASE WHEN p_partkey % 3 = 0 THEN '/' ELSE '' END AS key
        |      FROM part)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "part")
        .select(concat(col("p_brand"),
          when(pmod(col("p_partkey"), lit(3)) === 0, "/").otherwise("")).as("key"))
        .select(col("key"), Filters.isPrefix(col("key")).as("is_prefix"))
    },

    // ── A2: sum of object sizes under each top-level prefix ─────────────
    Q(
      "a2_size_under_prefix",
      """SELECT prefix, CAST(total AS BIGINT) AS total, CAST(n AS BIGINT) AS n
        |FROM (VALUES ('docs', 15, 1), ('video', 83, 6)) t(prefix, total, n)""".stripMargin) { (s, _) =>
      FixtureTree.ensure()
      Ingest.scan(s, B, "identity", depth = 4)
        .groupBy(split(col("key"), "/").getItem(0).as("prefix"))
        .agg(sum(col("size")).as("total"), count(lit(1)).as("n"))
    })
}
