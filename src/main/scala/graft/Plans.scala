package graft

/** Plan dump for the headline queries — the ".explain and iterate"
  * discipline as a reviewable artifact. Regenerate PLANS.md with:
  *
  *   { echo "<header>"; tools/run.sh graft.Plans; } > PLANS.md
  *
  * (PlanAuditSpec pins the load-bearing properties as tests; this dump
  * is the human-readable evidence.) */
object Plans {
  val Headliners: Seq[String] = Seq(
    "q1_pricing_summary", "q2_forecast_revenue", "q3_revenue_by_nation",
    "q7_top_customers_per_nation", "q21_brand_supplier_volume",
    "text_quality", "q24_running_qty_bucketed",
    "dedup_minhash_lsh", "ann_bruteforce_topk", "ann_ivf_topk", "ann_lsh_topk",
    "ann_ivf_index_topk", "corpus_curation", "events_asof_join",
    "pack_sequences", "corpus_decontaminate", "vocab_top_tokens",
    "emb_semantic_dedup", "corpus_training_build",
    "corpus_token_budget", "join_bucketed_colocated",
    "vocab_tfidf_top_terms", "corpus_lm_score",
    "emb_source_drift", "corpus_manifest", "dedup_entity_fuzzy",
    "dedup_containment", "profile_table", "ann_pq_topk", "ann_ivf_pq_topk",
    "ann_ivf_pq_residual", "corpus_dsir_select_threshold", "text_bm25_phrase",
    "vocab_unigram_apply",
    // round-16 optimization targets (plan-diff evidence for the MD)
    "text_bm25_large", "dedup_ngram_jaccard", "dedup_keep_best",
    "emb_quantize_error", "text_fingerprint")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local("graft-plans", "4")
    Headliners.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"\n## $n\n")
      println("```")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).trim)
      println("```")
    }
    graftLogPrunedRead(spark)
    graftLogDvRead(spark)
    optimizeEvidence(spark)
    dvDeleteCost(spark, sfDir)
    spark.stop()
  }

  /** Measured DV-vs-COW sparse-delete cost on this harness — the
    * trade stated with numbers, not adjectives. The predicate hits
    * ~0.1% of rows spread across EVERY file (the copy-on-write worst
    * case and the deletion-vector best case); the post-delete read is
    * the DV WORST case here because every file carries a vector —
    * OPTIMIZE absorbs them and restores the native read. At 100 TB
    * the delete gap is the whole file-rewrite cost. */
  private def dvDeleteCost(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def build(tag: String): String = {
      val t = java.nio.file.Files.createTempDirectory(s"plans_dvc_$tag").toString + "/t"
      graft.store.CommitLog.append(li.repartition(16), t)
      t
    }
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val (cow, mor) = (build("cow"), build("mor"))
    val pred = col("l_orderkey") % 1000 === 7
    val tCow = time(graft.store.CommitLog.deleteWhere(spark, cow, li.schema, pred))
    val tMor = time(graft.store.CommitLog.deleteWhere(spark, mor, li.schema, pred,
      deletionVectors = true))
    val tReadCow = time(graft.store.CommitLog.read(spark, cow, li.schema).count())
    val tReadMor = time(graft.store.CommitLog.read(spark, mor, li.schema).count())
    val tOpt = time(graft.store.CommitLog.optimize(spark, mor, 128L * 1024 * 1024))
    val tReadOpt = time(spark.read.format("graftlog").load(mor).count())
    println("\n## dv_delete_cost (measured, ~0.1% of rows across all 16 files)\n")
    println(f"copy-on-write delete: $tCow%.2f s (rewrites every touched file) | " +
      f"deletion-vector delete: $tMor%.2f s (one position vector, zero rewrites)")
    println(f"\npost-delete read: COW $tReadCow%.2f s (native) | " +
      f"DV $tReadMor%.2f s (every file vectored -- the worst case) | " +
      f"after OPTIMIZE absorb ($tOpt%.2f s): $tReadOpt%.2f s (native again)")
  }

  /** Deletion-vector read path: a table with one vectored and one
    * clean file — the plan must show the clean file on the native
    * vectorized scan and ONLY the vectored file behind the broadcast
    * anti-join; after OPTIMIZE the whole table is back on the native
    * path. */
  private def graftLogDvRead(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions.col
    val t = java.nio.file.Files.createTempDirectory("plans_dv").toString + "/t"
    spark.range(0, 100).toDF("id").coalesce(1)
      .write.format("graftlog").mode("append").save(t)
    spark.range(1000, 1100).toDF("id").coalesce(1)
      .write.format("graftlog").mode("append").save(t)
    val schema = spark.range(0).toDF("id").schema
    graft.store.CommitLog.deleteWhere(spark, t, schema, col("id") < 10,
      deletionVectors = true)
    val vectored = graft.store.CommitLog.read(spark, t, schema)
    println("\n## graftlog_dv_read (one vectored file + one clean file)\n")
    println("```")
    println(vectored.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).trim)
    println("```")
    println("\nThe clean file unions in on the native vectorized scan; only " +
      "the vectored file's rows pass through the BroadcastHashJoin " +
      "LeftAnti against the (file, row_index) vector -- " +
      s"${vectored.count()} rows visible of 200 physical.")
    graft.store.CommitLog.optimize(spark, t, targetBytes = 128L * 1024 * 1024)
    val absorbed = spark.read.format("graftlog").load(t)
    println("\nAfter OPTIMIZE (vector absorbed), the relation is native " +
      "again -- no join in the plan:\n")
    println("```")
    println(absorbed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).trim)
    println("```")
  }

  /** Selective-OPTIMIZE evidence: small files pack, the right-sized
    * file keeps its identity (no rewrite), out-of-scope WHERE files
    * stay untouched. */
  private def optimizeEvidence(spark: org.apache.spark.sql.SparkSession): Unit = {
    val t = java.nio.file.Files.createTempDirectory("plans_opt").toString + "/t"
    spark.range(0, 200000).toDF("id").coalesce(1)
      .write.format("graftlog").mode("append").save(t)
    (1 to 3).foreach(i =>
      spark.range(1000000L + i, 1000001L + i).toDF("id").coalesce(1)
        .write.format("graftlog").mode("append").save(t))
    val before = graft.store.CommitLog.liveFiles(spark, t)._2
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bigBytes = before.map(f => fs.getFileStatus(
      new org.apache.hadoop.fs.Path(t, f)).getLen).max
    graft.store.CommitLog.optimize(spark, t, targetBytes = bigBytes - 1)
    val after = graft.store.CommitLog.liveFiles(spark, t)._2
    val kept = before.toSet.intersect(after.toSet)
    println("\n## optimize_selective (bin-packing evidence)\n")
    println(s"live files before: ${before.size} (1 right-sized + 3 tiny); " +
      s"after OPTIMIZE: ${after.size}; files kept byte-identical: " +
      s"${kept.size} (the right-sized one) -- only the tiny files were " +
      "packed, so incremental consumers and caches over the big file " +
      "stay valid. compact() remains the deliberate full-rewrite verb.")
  }

  /** The logged-table batch relation's plan + the file-skipping
    * evidence: a three-file table with disjoint id ranges, a point
    * predicate, and the GraftLogFileIndex verdict (files kept vs
    * live) printed next to the formatted plan. */
  private def graftLogPrunedRead(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions.col
    val t = java.nio.file.Files.createTempDirectory("plans_graftlog").toString + "/t"
    Seq(0L -> 100L, 1000L -> 1100L, 5000L -> 5100L).foreach { case (a, b) =>
      spark.range(a, b).toDF("id").coalesce(1)
        .write.format("graftlog").mode("append").save(t)
    }
    val rel = spark.read.format("graftlog").load(t).where(col("id") < 50)
    println("\n## graftlog_pruned_read\n")
    println("```")
    println(rel.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).trim)
    println("```")
    def split(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case x => Seq(x)
    }
    val conj = rel.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.flatMap(split)
    val idx = new graft.sources.GraftLogFileIndex(spark, t)
    val kept = idx.listFiles(Nil, conj).map(_.files.size).sum
    println(s"\nGraftLogFileIndex verdict for `id < 50`: $kept of " +
      s"${idx.inputFiles.length} live files scanned -- the other " +
      s"${idx.inputFiles.length - kept} are ruled out from LOG-carried " +
      "min/max stats with zero file I/O (GraftLogBatchSpec proves this " +
      "by destroying the ruled-out files' bytes).")
  }
}
