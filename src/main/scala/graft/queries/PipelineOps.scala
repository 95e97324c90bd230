package graft.queries

import graft.{Q, Tables}
import graft.core.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the reference's per-record transform
  * operators (SURVEY.md §2.3): hashing (P3–P5), env split (P7), path→key
  * (P8). Query names carry the SURVEY operator ids.
  *
  * The operators are pure Column compositions, so they are verified the
  * strongest way available: the DuckDB oracle recomputes the same
  * digests over the same rows and the driver hash-compares. URLs are
  * synthesized deterministically from the `part` fixture so both engines
  * see identical inputs.
  *
  * Scale: every expression here is a codegen'd builtin on a single scan —
  * no shuffle, no UDF; at 100 TB these run at parquet-scan speed.
  */
object PipelineOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic synthetic object URL per part row — mixed-case
    * extensions + an extension-less case exercise the ext-filter corners
    * (ingest/util.go:39 lowercases before matching). */
  private def withUrl(df: DataFrame): DataFrame =
    df.withColumn("ext_part",
        expr("CASE pmod(p_partkey, 5) WHEN 0 THEN '.mov' WHEN 1 THEN '.MOV' " +
          "WHEN 2 THEN '.mp4' WHEN 3 THEN '.txt' ELSE '' END"))
      .withColumn("url",
        concat(lit("s3://data/media/"), col("p_brand"), lit("/"),
          col("p_partkey"), col("ext_part")))

  private val urlSql =
    """concat('s3://data/media/', p_brand, '/', p_partkey,
      |  CASE (p_partkey % 5) WHEN 0 THEN '.mov' WHEN 1 THEN '.MOV'
      |       WHEN 2 THEN '.mp4' WHEN 3 THEN '.txt' ELSE '' END)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── P3: URL → digest (resource identity, resource.go:27-34) ─────────
    Q(
      "p3_url_hash",
      s"""SELECT url, sha256(url) AS hash
         |FROM (SELECT $urlSql AS url FROM part)""".stripMargin) { (s, dir) =>
      withUrl(t(s, dir, "part"))
        .select(col("url"), Hashing.urlHash(col("url")).as("hash"))
    },

    // ── P4: order-insensitive collated hash (hash.go:26-40) ─────────────
    // task_hash(in,out) must equal task_hash(out,in); the oracle rebuilds
    // the same digest with least/greatest standing in for sort_array.
    Q(
      "p4_collated_hash",
      s"""WITH u AS (SELECT $urlSql AS in_url FROM part),
         |r AS (SELECT in_url, 'mirror://' || sha256(in_url) || '/' AS out_url FROM u),
         |h AS (SELECT in_url, out_url,
         |        sha256(in_url)  AS h_in,
         |        sha256(out_url) AS h_out FROM r)
         |SELECT in_url,
         |  sha256(least(h_in, h_out) || greatest(h_in, h_out)) AS task_hash,
         |  CAST(TRUE AS BOOLEAN) AS order_insensitive
         |FROM h""".stripMargin) { (s, dir) =>
      withUrl(t(s, dir, "part"))
        .withColumn("in_url", col("url"))
        .withColumn("out_url", concat(lit("mirror://"), sha2(col("in_url"), 256), lit("/")))
        .select(
          col("in_url"),
          Hashing.taskHash(col("in_url"), col("out_url")).as("task_hash"),
          (Hashing.taskHash(col("in_url"), col("out_url")) ===
            Hashing.taskHash(col("out_url"), col("in_url"))).as("order_insensitive"))
    },

    // ── P5: canonical struct hash (hash.go:42-58, map keys sorted) ──────
    Q(
      "p5_strategy_hash",
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
        |  sha256('process|image=graft/mov:1' || chr(10) || 'seed=' || p_partkey)
        |    AS strategy_hash
        |FROM part""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey").cast("long").as("p_partkey"),
        Hashing.strategyHash(
          lit("process"),
          map(lit("seed"), col("p_partkey").cast("string"),
              lit("image"), lit("graft/mov:1"))).as("strategy_hash"))
    },

    // ── P7: env-string split (executor_docker.go:242-251) ───────────────
    Q(
      "p7_env_split",
      """SELECT doc_id,
        |  CAST(len(str_split('SRC=' || source || chr(10) || 'LANG=' || lang, chr(10))) AS BIGINT) AS n_env,
        |  str_split('SRC=' || source || chr(10) || 'LANG=' || lang, chr(10))[1] AS first_env
        |FROM documents""".stripMargin) { (s, dir) =>
      val env = concat(lit("SRC="), col("source"), lit("\n"), lit("LANG="), col("lang"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(split(env, "\n")).cast("long").as("n_env"),
        element_at(split(env, "\n"), 1).as("first_env"))
    },

    // ── P8: path → key join (s3.go:159-162) ─────────────────────────────
    Q(
      "p8_path_to_key",
      """SELECT doc_id,
        |  'mirror/docs/' || source || '/' || doc_id || '.txt' AS key
        |FROM documents""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("path", concat(lit("/work/in/"), col("source"), lit("/"), col("doc_id"), lit(".txt")))
        .select(
          col("doc_id"),
          concat(lit("mirror/docs/"),
            regexp_replace(col("path"), "^/work/in/", "")).as("key"))
    })
}
