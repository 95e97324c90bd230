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
      val docs = Tables.load(s, dir, "documents")
      // Spread gate (the Dedup.nearDupPairs pattern, guide §2.5 "input
      // skew: one huge unsplittable file → repartition immediately
      // after the read"): the fixture corpus is a single-row-group
      // file, so without this the CPU-heavy scoring kernels below run
      // as ONE task (measured 0.68 s serial of a 1.9 s query). The
      // gate keeps the shuffle a small-input-only fixup — a cluster
      // scan with >= defaultParallelism splits passes through
      // untouched, so nothing extra ever shuffles at 100 TB.
      val scanParts = docs.select(col("doc_id"))
        .queryExecution.executedPlan.execute().getNumPartitions
      val spreadDocs =
        if (scanParts < s.sparkContext.defaultParallelism)
          docs.repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        else docs
      val scored = spreadDocs
        .select(col("doc_id"), col("text"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.langId(col("text")).as("pred_lang"))
      // repetition threshold 0.08: the fixture corpus's natural
      // duplicate-bigram fraction tops out ≈0.10 (median 0.03), so the
      // filter drops a real high-repetition tail without gutting the
      // corpus — production pipelines tune this per-source.
      //
      // The keep DECISION is computed once and materialized as a tiny
      // (doc_id, quality) frame — the scoring kernels otherwise re-run
      // over the full corpus in every consumer of the filtered set (the
      // LSH band scan, its two text re-attach joins, and the final
      // anti-join: 4× in round 4, which is exactly the bench regression
      // the repetition kernel exposed). Consumers that need text
      // re-attach it by a doc_id equi-join against the RAW scan — a
      // cheap hash probe (AQE broadcasts the id set when small), never
      // a repeated kernel pass. This is the in-session analog of the
      // production shape: curated-id manifest at rest, text stays put.
      val keptIds = scored
        .filter(col("quality") >= 0.6 && col("pred_lang") === "en" &&
          TextOps.duplicateNgramFraction(col("text")) < 0.08)
        .select(col("doc_id"), col("quality"))
        .localCheckpoint(true)
      val keptText = docs.select(col("doc_id"), col("text"))
        .join(keptIds.select("doc_id"), Seq("doc_id"))
      // partitionsHint: probing keptText itself would replan its join
      // (and under AQE materialize the broadcast a second time); the
      // broadcast join preserves the scan's partitioning, so the raw
      // scan's partition count (already probed for the spread gate) is
      // the same number
      val dropIds = Dedup.nearDupPairs(keptText, "doc_id", "text", threshold = 0.6,
          partitionsHint = Some(scanParts))
        .select(col("id_b").as("doc_id")).distinct()
      keptIds.join(dropIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("quality"))
    }.copy(bench = true),

    // ── The full training-data build, end to end in ONE plan: quality
    // filter → near-dup clusters → keep the best member per cluster →
    // leakage-safe split hashed on the CLUSTER id → concat-and-chunk
    // packing within each split. Every stage is a shared snippet /
    // operator verified on its own elsewhere; this pins that the
    // COMPOSITION stays oracle-exact. Output: per split, the document,
    // token, and packed-sequence counts a training run consumes.
    // (Packing partitions by split here — production adds a shard key
    // inside each split, the packConcatChunk shardCol, to bound window
    // partitions; 3 partitions is the fixture-scale stand-in.) ────────
    Q(
      "corpus_training_build",
      s"""WITH RECURSIVE base AS (
         |  ${OracleSnippets.chainedMutantCorpusSql}),
         |corpus AS (
         |  SELECT doc_id, text FROM base
         |  WHERE ${OracleSnippets.qualitySql} >= 0.6),
         |${OracleSnippets.minhashLshPairsCte},
         |good AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.6),
         |${OracleSnippets.componentsCte},
         |clustered AS (
         |  SELECT c.doc_id, c.text, coalesce(cp.component, c.doc_id) AS cluster
         |  FROM corpus c LEFT JOIN comp cp ON cp.id = c.doc_id),
         |kept AS (SELECT doc_id, text, cluster FROM (
         |  SELECT doc_id, text, cluster,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY ${OracleSnippets.qualitySql} DESC, doc_id) AS rn
         |  FROM clustered) WHERE rn = 1),
         |assigned AS (
         |  SELECT doc_id, len(str_split(text, ' ')) AS tok,
         |    CASE WHEN ${OracleSnippets.md5BucketSql("CAST(cluster AS VARCHAR)")} < 8 THEN 'train'
         |         WHEN ${OracleSnippets.md5BucketSql("CAST(cluster AS VARCHAR)")} = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM kept),
         |packed AS (
         |  SELECT split, tok,
         |    sum(tok) OVER (PARTITION BY split ORDER BY doc_id) - tok AS start_tok
         |  FROM assigned)
         |SELECT split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(tok) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT floor(start_tok / 512.0)) AS BIGINT) AS n_sequences
         |FROM packed GROUP BY split""".stripMargin) { (s, dir) =>
      val base = DedupQueries.chainedMutantCorpus(s, dir)
      val corpus = base.filter(TextOps.qualityScore(col("text")) >= 0.6)
      val clustered = corpus.join(DedupQueries.clusterLabels(corpus), Seq("doc_id"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
        .orderBy(TextOps.qualityScore(col("text")).desc, col("doc_id"))
      val kept = clustered.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val assigned = kept.select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("tok"),
        when(graft.core.Hashing.md5Bucket(col("cluster"), 10) < 8, "train")
          .when(graft.core.Hashing.md5Bucket(col("cluster"), 10) === 8, "val")
          .otherwise("test").as("split"))
      graft.operators.CorpusOps
        .packConcatChunk(assigned, "doc_id", "tok", "split", 512)
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("tok")).as("n_tokens"),
          countDistinct(col("seq")).as("n_sequences"))
    })
}
