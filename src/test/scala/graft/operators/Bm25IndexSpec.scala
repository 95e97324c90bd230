package graft.operators

import graft.SparkSpec
import graft.store.CommitLog
import org.apache.spark.sql.functions._

/** The at-rest BM25 index: incremental maintenance off the change
  * feed (crash-resume exactly-once), probe ≡ from-scratch recompute,
  * and row-level retraction on source DELETE — the three claims the
  * logged-index design makes over a bare recompute. */
class Bm25IndexSpec extends SparkSpec {

  private def freshDirs(name: String): (String, String, String) = {
    val base = s"/tmp/graft_test/bm25_$name"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    (s"$base/src", s"$base/postings", s"$base/doclens")
  }

  private lazy val docs = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .select("doc_id", "text")

  private def probes = spark.createDataFrame(Seq(
    (1L, "vector scan filter"), (2L, "customer order join")))
    .toDF("query_id", "query_text")

  private def topk(postT: String, lensT: String) =
    Bm25Index.bm25TopKFromIndex(spark, postT, lensT, "doc_id", probes, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

  private def recompute(d: org.apache.spark.sql.DataFrame) =
    CorpusOps.bm25TopK(d, "doc_id", "text", probes, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

  test("crash after the first postings batch resumes exactly-once; probe equals recompute") {
    val (srcT, postT, lensT) = freshDirs("crash")
    CommitLog.append(docs.filter(col("doc_id") % 2 === 0), srcT)
    CommitLog.append(docs.filter(col("doc_id") % 2 =!= 0), srcT)
    val crashed = intercept[RuntimeException] {
      Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
        "doc_id", "text", maxVersionsPerBatch = 1L,
        afterBatch = (n, _) =>
          if (n == 1) throw new RuntimeException("injected post-commit crash"))
    }
    assert(crashed.getMessage.startsWith("injected"))
    Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
      "doc_id", "text", maxVersionsPerBatch = 1L)
    // no document double-counted: postings rows are unique per (doc, term)
    val post = CommitLog.read(spark, postT, Bm25Index.postingsSchema("doc_id"))
    assert(post.groupBy("doc_id", "term").count().filter(col("count") > 1)
      .isEmpty, "a replayed batch double-inserted postings")
    // every document (even token-free ones) has exactly one doclens row
    val lens = CommitLog.read(spark, lensT, Bm25Index.docLensSchema("doc_id"))
    assert(lens.count() == docs.count())
    assert(topk(postT, lensT) == recompute(docs),
      "indexed probe diverges from the from-scratch recompute")
  }

  test("term-clustered postings prune the probe scan to the term's files") {
    val (srcT, postT, lensT) = freshDirs("prune")
    CommitLog.append(docs, srcT)
    Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
      "doc_id", "text")
    // re-cluster the postings by term into several small files — the
    // production maintenance step the probe's docstring names
    CommitLog.compact(spark, postT, targetBytes = 8 * 1024,
      clusterBy = Some("term"))
    val live = CommitLog.liveFiles(spark, postT)._2
    assert(live.size >= 2, s"fixture too small to split: $live")
    val oneTerm = spark.createDataFrame(Seq((1L, "vector")))
      .toDF("query_id", "query_text")
    // AQE off so the physical tree is inspectable (the PlanAuditSpec
    // pattern); pruning happens at scan planning either way
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = Bm25Index.bm25TopKFromIndex(spark, postT, lensT, "doc_id",
        oneTerm, k = 5)
      assert(probe.count() > 0)
      // every postings scan in the probe plan (tf side + df side) must
      // prune: the literal isin reaches the log's range stats, so only
      // the files whose [min,max] term range can hold 'vector' are read
      val perScan = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.schema.fieldNames.contains("tf") =>
          f.selectedPartitions.totalNumberOfFiles
      }
      assert(perScan.nonEmpty)
      perScan.foreach(n => assert(n < live.size,
        s"postings probe scanned $n of ${live.size} term-clustered files — no pruning"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("mid-drain probe reads the aligned pre-batch snapshot, never a torn mix") {
    val (srcT, postT, lensT) = freshDirs("torn")
    val batchA = docs.filter(col("doc_id") % 2 === 0)
    val batchB = docs.filter(col("doc_id") % 2 =!= 0)
    CommitLog.append(batchA, srcT)
    Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
      "doc_id", "text")
    // second source version: crash AFTER the postings apply, BEFORE the
    // doclens drain — the exact torn window (postings at source v2,
    // doclens at v1)
    CommitLog.append(batchB, srcT)
    intercept[RuntimeException] {
      Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
        "doc_id", "text",
        afterBatch = (_, _) => throw new RuntimeException("injected"))
    }
    assert(CommitLog.lastConsumed(spark, postT) >
      CommitLog.lastConsumed(spark, lensT), "fixture failed to tear")
    // the probe must NOT mix batch-B postings with batch-A doclens: it
    // pins both reads to the last aligned source version = batch A only
    assert(topk(postT, lensT) == recompute(batchA),
      "mid-drain probe is torn — it must equal the pre-batch recompute")
    // resume heals the tear; the probe advances to the full corpus
    Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
      "doc_id", "text")
    assert(topk(postT, lensT) == recompute(docs),
      "post-resume probe diverges from the full recompute")
  }

  test("txn-ledger alignment: a probe racing the two streaming applies sees the pre-batch snapshot") {
    val (_, postT, lensT) = freshDirs("txn_torn")
    val batchA = docs.filter(col("doc_id") % 2 === 0)
    val batchB = docs.filter(col("doc_id") % 2 =!= 0)
    def asChanges(d: org.apache.spark.sql.DataFrame, v: Long) = d
      .withColumn(CommitLog.ChangeTypeCol, lit("insert"))
      .withColumn("_commit_version", lit(v))
    def probe() = Bm25Index.bm25TopKFromIndex(spark, postT, lensT,
      "doc_id", probes, k = 10, txnQueryId = Some("q16"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // batch 0 fully applied → aligned at batch 0
    Bm25Index.applyIndexChangesOnce(spark, postT, lensT, "doc_id", "text",
      asChanges(batchA, 1L), "q16", batchId = 0L)
    assert(probe() == recompute(batchA))
    // batch 1 HALF-applied (postings only — the crash window between
    // the two applies): the aligned probe must still see batch 0
    graft.store.CdcStream.applyChangesOnce(spark, postT,
      Bm25Index.postingsSchema("doc_id"), Seq("doc_id"),
      asChanges(batchB, 2L), "q16", 1L,
      Bm25Index.postingsTransform("doc_id", "text"))
    assert(CommitLog.lastTxnBatch(spark, postT, "q16") >
      CommitLog.lastTxnBatch(spark, lensT, "q16"), "fixture failed to tear")
    assert(probe() == recompute(batchA),
      "txn-aligned probe is torn — it must equal the pre-batch recompute")
    // the replayed batch heals: postings fences, doclens applies
    Bm25Index.applyIndexChangesOnce(spark, postT, lensT, "doc_id", "text",
      asChanges(batchB, 2L), "q16", batchId = 1L)
    assert(probe() == recompute(docs))
  }

  test("probe-batch term bound refuses loud and names the split remedy") {
    val (srcT, postT, lensT) = freshDirs("cap")
    CommitLog.append(docs.limit(5), srcT)
    Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
      "doc_id", "text")
    val wide = spark.createDataFrame(Seq((1L, "alpha beta gamma delta")))
      .toDF("query_id", "query_text")
    val e = intercept[IllegalArgumentException] {
      Bm25Index.bm25TopKFromIndex(spark, postT, lensT, "doc_id", wide,
        k = 5, maxProbeTerms = 3)
    }
    assert(e.getMessage.contains("split the query batch"),
      s"refusal must name the remedy: ${e.getMessage}")
  }

  test("phrase scorer: hand-traced anchors, overlap and duplicate-term offsets") {
    val (srcT, postT, lensT) = freshDirs("phrase")
    import spark.implicits._
    val tiny = Seq((1L, "a b a b"), (2L, "a a a"), (3L, "b a"))
      .toDF("doc_id", "text")
    CommitLog.append(tiny, srcT)
    Bm25Index.drainIntoIndex(spark, srcT, tiny.schema, postT, lensT,
      "doc_id", "text")
    val phrases = Seq((1L, "a b"), (2L, "a a")).toDF("query_id", "query_text")
    val got = Bm25Index.phraseTopKFromIndex(spark, postT, "doc_id", phrases, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // "a b": doc1 anchors {1, 3}; doc3's b-then-a never completes.
    // "a a": doc2's run of three holds the OVERLAPPING anchors {1, 2};
    // doc1's alternation never has a at adjacent positions.
    assert(got == Set((1L, 1L, 1L, 2L), (2L, 1L, 2L, 2L)),
      s"hand trace diverged: $got")
    // retraction: deleting the only matching doc empties its query
    CommitLog.deleteWhere(spark, srcT, tiny.schema, col("doc_id") === 2)
    Bm25Index.drainIntoIndex(spark, srcT, tiny.schema, postT, lensT,
      "doc_id", "text")
    val after = Bm25Index.phraseTopKFromIndex(spark, postT, "doc_id", phrases, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(after == Set((1L, 1L, 1L, 2L)),
      s"retracted doc still matches: $after")
  }

  test("source DELETE retracts a document's postings and doclens row") {
    val (srcT, postT, lensT) = freshDirs("delete")
    CommitLog.append(docs, srcT)
    Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
      "doc_id", "text")
    CommitLog.deleteWhere(spark, srcT, docs.schema, col("doc_id") % 5 === 0)
    Bm25Index.drainIntoIndex(spark, srcT, docs.schema, postT, lensT,
      "doc_id", "text")
    val remaining = docs.filter(col("doc_id") % 5 =!= 0)
    val lens = CommitLog.read(spark, lensT, Bm25Index.docLensSchema("doc_id"))
    assert(lens.count() == remaining.count(),
      "deleted documents still hold doclens rows")
    val post = CommitLog.read(spark, postT, Bm25Index.postingsSchema("doc_id"))
    assert(post.filter(col("doc_id") % 5 === 0).isEmpty,
      "deleted documents still hold postings")
    // N, avgdl, df, tf all reflect the post-delete corpus: scores match
    // a recompute over the remaining documents exactly
    assert(topk(postT, lensT) == recompute(remaining),
      "post-delete probe diverges from a recompute over the remaining corpus")
  }
}
