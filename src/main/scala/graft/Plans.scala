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
    "q1_pricing_summary", "q3_revenue_by_nation", "q24_running_qty_bucketed",
    "dedup_minhash_lsh", "ann_bruteforce_topk", "ann_ivf_topk", "ann_lsh_topk",
    "ann_ivf_index_topk", "corpus_curation", "events_asof_join",
    "pack_sequences", "corpus_decontaminate", "vocab_top_tokens",
    "emb_semantic_dedup", "corpus_training_build",
    "corpus_token_budget", "join_bucketed_colocated",
    "vocab_tfidf_top_terms", "corpus_lm_score",
    "emb_source_drift", "corpus_manifest", "dedup_entity_fuzzy",
    "dedup_containment", "profile_table")

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
    spark.stop()
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
