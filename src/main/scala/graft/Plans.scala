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
    spark.stop()
  }
}
