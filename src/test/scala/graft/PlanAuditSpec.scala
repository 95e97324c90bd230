package graft

/** Plan hygiene across the declared query surface (the brief's
  * ".explain and iterate" discipline, pinned as tests):
  *
  *  - No CartesianProduct anywhere. The only unconditioned joins in the
  *    engine (brute-force ANN, IVF cell assignment) must plan as
  *    BroadcastNestedLoopJoin with the bounded side broadcast.
  *  - Filters on the flagship scans reach the parquet reader
  *    (PushedFilters), so a 100 TB scan prunes at the source.
  *  - No per-row Scala UDFs in any plan — everything is builtin
  *    expressions (codegen) or explicit mapPartitions stages.
  */
class PlanAuditSpec extends SparkSpec {

  /** Pure queries only: the pipeline_/a3_/a4_/d1_/s1_/stream_ entries
    * execute real jobs (ingest/exec/streaming) while BUILDING their
    * result frame, and the memory-sink streaming results have no
    * interesting batch plan. */
  private def pureQueries: Seq[Q] = SparkEntry.allQueries.filter { q =>
    val n = q.name
    !(n.startsWith("pipeline_") || n.startsWith("a3_") || n.startsWith("a4_") ||
      n.startsWith("d1_") || n.startsWith("s1_") || n.startsWith("stream_") ||
      n.startsWith("multimodal_binary") || n.startsWith("format_") ||
      n.startsWith("f1_") || n.startsWith("f5_") || n.startsWith("a2_"))
  }

  test("no CartesianProduct in any declared query plan") {
    val offenders = pureQueries.flatMap { q =>
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
  }

  test("no Scala UDFs anywhere in the declared plans") {
    val offenders = pureQueries.flatMap { q =>
      val plan = q.fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      if (plan.contains("UDF(")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"UDF plans: ${offenders.mkString(", ")}")
  }

  /** AQE wraps plans in AdaptiveSparkPlanExec until first execution —
    * run the frame, then read the final plan tree. */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.collect() // a write would spawn a separate execution and leave THIS plan unfinalized
    df.queryExecution.executedPlan.toString
  }

  test("q1 filter is pushed to the parquet scan") {
    val plan = finalPlan("q1_pricing_summary")
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThanOrEqual(l_shipdate"),
      s"no shipdate pushdown:\n$plan")
  }

  test("brute-force ANN plans broadcast nested-loop, never shuffle-cartesian") {
    val plan = SparkEntry.queries("ann_bruteforce_topk")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("ANN plans: no shuffle exchange carries an embedding array") {
    // AQE off so the physical tree is inspectable without running it
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (name <- Seq("ann_ivf_topk", "ann_lsh_topk", "ann_bruteforce_topk",
          "corpus_diversity_sample")) {
        val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
        val shuffles = df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
        }
        assert(shuffles.nonEmpty, s"$name: expected at least the top-k window exchange")
        val offenders = shuffles.filter(
          _.output.exists(_.dataType.catalogString.contains("array<")))
        assert(offenders.isEmpty,
          s"$name shuffle exchanges carry array columns:\n${offenders.mkString("\n\n")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("batch LSH rerank: no broadcasts; embeddings cross exactly the two re-attach exchanges") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("ann_lsh_batch_topk")(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      val planStr = plan.toString
      // corpus-scale |Q|: nothing may broadcast — every join must be a
      // shuffle join on scalar keys
      assert(!planStr.contains("BroadcastHashJoin") &&
             !planStr.contains("BroadcastNestedLoopJoin"),
        s"batch rerank broadcasts a corpus-scale side:\n$planStr")
      assert(planStr.contains("ShuffledHashJoin"),
        s"expected shuffle hash joins:\n$planStr")
      // embedding arrays cross exactly the TWO (tbl, bucket) bucket
      // exchanges — linear in corpus size; the pair dedup and top-k
      // window exchanges stay scalar (a candidate-pair intermediate
      // carrying arrays would scale with collisions × N × |Q|)
      val arrayExchanges = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if s.output.exists(_.dataType.catalogString.contains("array<")) => s
      }
      assert(arrayExchanges.size == 2,
        s"expected exactly the two bucket exchanges to carry embeddings, got " +
          s"${arrayExchanges.size}:\n${arrayExchanges.mkString("\n")}")
      arrayExchanges.foreach { s =>
        val part = s.outputPartitioning.toString
        assert(part.contains("tbl") && part.contains("bucket"),
          s"array exchange not keyed by (tbl, bucket): $part")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("corpus-scale hard negatives: no broadcasts; embeddings cross exactly the two cid exchanges") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("ann_hard_negatives_large")(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      val planStr = plan.toString
      // |anchors| ≈ N: the anchor set must never broadcast (with or
      // without its embeddings) — every join is a shuffle join on the
      // scalar cid key
      assert(!planStr.contains("BroadcastHashJoin") &&
             !planStr.contains("BroadcastNestedLoopJoin"),
        s"corpus-scale mining broadcasts a corpus-scale side:\n$planStr")
      assert(planStr.contains("ShuffledHashJoin"),
        s"expected a shuffle hash join on cid:\n$planStr")
      val arrayExchanges = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if s.output.exists(_.dataType.catalogString.contains("array<")) => s
      }
      assert(arrayExchanges.size == 2,
        s"expected exactly the two cid-keyed exchanges to carry embeddings, got " +
          s"${arrayExchanges.size}:\n${arrayExchanges.mkString("\n")}")
      arrayExchanges.foreach { s =>
        val part = s.outputPartitioning.toString
        assert(part.contains("cid"),
          s"array exchange not keyed by cid: $part")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("BM25 df broadcast is restricted to queried terms, never vocab-sized") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("text_bm25_topk")(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      val dfBroadcasts = plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
            if b.output.exists(_.name == "df") => b
      }
      assert(dfBroadcasts.nonEmpty, "expected the df side to broadcast")
      // the broadcast subtree must contain the left-semi restriction to
      // the query-term set — broadcasting the raw per-term aggregate
      // would ship the whole vocabulary
      dfBroadcasts.foreach { b =>
        assert(b.toString.contains("LeftSemi"),
          s"df broadcast not semi-joined to query terms (vocab-sized):\n$b")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("whole-stage codegen covers the relational flagships") {
    for (name <- Seq("q1_pricing_summary", "q3_revenue_by_nation", "q24_running_qty_bucketed")) {
      // codegen'd spans print as "*(n) Operator" in the simple plan string
      assert(finalPlan(name).contains("*("), s"$name fell out of codegen")
    }
  }

  test("DSIR selection cut plans as TakeOrdered, never a global rank window") {
    val plan = finalPlan("corpus_dsir_select")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    // the per-doc-count join against the log-ratio table must broadcast
    // — a contains(BroadcastHashJoin) alone can't pin that (the tiny
    // bucket×bucket join broadcasts anyway), but NO join in this plan
    // may sort-merge: the corpus-derived side is always the streamed
    // side of a broadcast
    assert(plan.contains("BroadcastHashJoin"), s"log-ratio table not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-sized side regressed to a shuffle join:\n$plan")
  }

  test("DSIR threshold cut: nothing O(k) merges on the driver or in one task") {
    // fixture regime: k=200 of 500 docs, relErr=0.01 — the bracket
    // leaves a boundary slice of a few dozen rows, so `need` ≪ k
    val k = 200
    val plan = finalPlan("corpus_dsir_select_threshold")
    assert(!plan.contains("CollectLimit"),
      s"threshold cut collects on the driver:\n$plan")
    // Catalyst rewrites the boundary window's rank filter into an
    // INTERIOR TakeOrderedAndProject — the right plan: non-root, so it
    // merges on an executor, and its limit is the boundary budget
    // `need` (quantile-error-sized, k-independent), never k. Pin both:
    // every TakeOrdered in the plan is interior (the root is the
    // union) and err-sized.
    val limits = "TakeOrderedAndProject\\(limit=(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toList
    assert(limits.forall(_ < k / 2),
      s"a TakeOrdered merges O(k) rows — limits $limits vs k=$k:\n$plan")
    assert(plan.contains("Union"), s"missing sure ∪ boundary union:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-sized side regressed to a shuffle join:\n$plan")
  }

  test("corpus-scale BM25 sweep: term joins shuffle-hash, nothing query-derived broadcasts") {
    val plan = finalPlan("text_bm25_large")
    // the two term-keyed joins (postings ⋈ query terms, postings ⋈
    // capped df) must be shuffle-hash — at |Q| ≈ N neither side fits a
    // broadcast; only the 1-row stats frame may broadcast
    val shj = "ShuffledHashJoin \\[term".r.findAllIn(plan).size
    assert(shj >= 2, s"expected ≥2 shuffle-hash term joins, got $shj:\n$plan")
    // the doc-keyed dl join may broadcast ADAPTIVELY (AQE sees a tiny
    // fixture; at corpus size it regresses to a shuffle join on its
    // own) — what must NEVER broadcast is a TERM-keyed side, which is
    // query-derived and |Q|-scaled
    assert(!plan.contains("BroadcastHashJoin [term"),
      s"a query-derived term side is broadcast in the corpus-scale sweep:\n$plan")
  }

  test("vocab top-k plans as TakeOrdered, never a global sort of the vocabulary") {
    val plan = finalPlan("vocab_top_tokens")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    // partial aggregation must run map-side before the token exchange
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"no partial agg before the exchange:\n$plan")
  }

  test("boilerplate apply pass is scan-side narrow: zero shuffles, no text exchange") {
    val df = SparkEntry.queries("corpus_boilerplate_lines")(spark, sf("sf0.001"))
    // building the frame ran the line-frequency pass (scalar-hash
    // exchange + driver-bounded collect); the RESULT plan is the apply
    // pass — filter + reassemble per doc against the literal hash set,
    // which must be completely exchange-free
    val shuffles = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"boilerplate apply pass shuffles:\n${df.queryExecution.executedPlan}")
  }

  test("boilerplate apply pass above the broadcast threshold: still zero shuffles") {
    // force the large-set shape (broadcast probe instead of the literal
    // array) on the same table: the plan contract is identical — the
    // apply pass stays scan-side narrow, text never crosses an exchange
    val base = graft.Tables.load(spark, sf("sf0.001"), "documents")
    // duplicate every doc under a fresh id so every line recurs in >= 2
    // docs — the boiler set is guaranteed non-empty and the large-set
    // shape is forced by broadcastAbove = 0
    val docs = base.unionByName(base.withColumn("doc_id",
      org.apache.spark.sql.functions.col("doc_id") + 1000000000L))
    val df = graft.operators.CorpusOps.removeBoilerplateLines(
      docs, "doc_id", "text", "\n", minDocs = 2, broadcastAbove = 0)
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("graft_broadcast_set_probe"),
      s"large-set path not probing the broadcast:\n$plan")
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, s"broadcast-probe apply pass shuffles:\n$plan")
  }

  test("count-min heavy hitters: the sketch broadcasts; candidates never sort-merge") {
    val df = SparkEntry.queries("vocab_cm_heavy_hitters")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the sketch is depth×width BY CONSTRUCTION — the estimates join
    // must broadcast it, never shuffle the candidate token stream into
    // a sort-merge/shuffled-hash join
    assert(plan.contains("BroadcastHashJoin"), s"sketch not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"candidate stream shuffled for the sketch join:\n$plan")
    // ranking cuts with TakeOrdered, never a global sort of the vocab
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    val shuffled = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffled.forall(!_.output.exists(_.dataType.catalogString.contains("array<"))),
      "a CM exchange carried an array column")
  }

  test("containment dedup: no cartesian product; no exchange carries document text") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("dedup_containment")(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      assert(!plan.toString.contains("CartesianProduct"),
        s"containment planned a cartesian:\n$plan")
      // past the scan, only (doc_id, md5-fingerprint) scalars move: an
      // exchange carrying `text` would ship the corpus per shuffle
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.nonEmpty)
      assert(shuffles.forall(!_.output.exists(_.name == "text")),
        "a containment exchange carried document text")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("table profile: one aggregation whose exchanges don't scale with column count") {
    val df = SparkEntry.queries("profile_table")(spark, sf("sf0.001"))
    val shuffles = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    // the multi-distinct plan is Expand → partial → exchange → final →
    // single-partition exchange: TWO exchanges for any number of
    // profiled columns. A per-column-pass shape would show a pair per
    // column (8 here). (Distinct values themselves do cross the first
    // exchange — the documented cost floor of an EXACT distinct; the
    // approx_count_distinct swap removes it at scale.)
    assert(shuffles.size <= 2,
      s"profile exchanges scale with the column count: ${shuffles.size}")
  }

  test("sequence packing shuffles once, by shard, with scalar columns only") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("pack_sequences")(spark, sf("sf0.001"))
      val shuffles = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      // one exchange for the per-shard window; the groupBy(shard, seq)
      // reuses that partitioning (shard ⊂ grouping keys → no re-shuffle)
      assert(shuffles.size == 1,
        s"expected exactly the shard window exchange, got ${shuffles.size}")
      assert(shuffles.head.outputPartitioning.toString.contains("shard"),
        s"window exchange not keyed by shard: ${shuffles.head.outputPartitioning}")
      assert(!shuffles.head.output.exists(_.dataType.catalogString.contains("array<")),
        "packing shuffled an array column")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("length-bucketed batching windows on (bucket, shard), never bucket alone") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("pack_length_bucketed")(spark, sf("sf0.001"))
      val shuffles = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      // one exchange for the (bucket, shard) window; the groupBy
      // (bucket, shard, batch) reuses that partitioning. A bucket-only
      // key would cap the window sort at the ~30 buckets that can ever
      // exist — the constant-cardinality-key failure mode.
      assert(shuffles.size == 1,
        s"expected exactly the window exchange, got ${shuffles.size}")
      val part = shuffles.head.outputPartitioning.toString
      assert(part.contains("bucket") && part.contains("shard"),
        s"window exchange not keyed by (bucket, shard): $part")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("decontamination broadcasts the benchmark side; the corpus never shuffles its text") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("corpus_decontaminate")(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastHashJoin"),
        s"benchmark shingles not broadcast:\n$plan")
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      // only the final (doc_id, bench_id) count aggregation may exchange
      val offenders = shuffles.filter(_.output.exists(a =>
        a.name == "text" || a.name == "sh"))
      assert(offenders.isEmpty,
        s"corpus text/shingles crossed an exchange:\n${offenders.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("curation scoring kernels run in exactly one place (the keep-decision subtree)") {
    // The round-4 regression: the scored+filtered corpus subtree was
    // re-evaluated in every consumer (LSH band scan, two text re-attach
    // joins, final anti-join), re-running the scoring kernels 4× over
    // the corpus. The fix materializes the keep decision once; these
    // counts pin it. The kernels appear ZERO times in the final plan —
    // they live behind the checkpointed keep-decision leaf — and the
    // checkpoint leaf itself must be present.
    val df = SparkEntry.queries("corpus_curation")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    for (kernel <- Seq("graft_token_hits", "graft_shingle_stats")) {
      val n = kernel.r.findAllIn(plan).length
      assert(n == 0,
        s"$kernel appears $n× in the curation plan — the keep decision leaked out of its checkpoint:\n$plan")
    }
    assert(plan.contains("Scan ExistingRDD"),
      s"checkpointed keep-decision leaf missing from the curation plan:\n$plan")
  }

  test("quality calibration evaluates the scoring kernel exactly once") {
    // The scored leaf feeds BOTH the percentile aggregate (threshold)
    // and the final per-language group-by — without its checkpoint the
    // quality kernel runs 2× over the corpus (round-6 review #3). The
    // kernel must appear zero times in the final plan (it lives behind
    // the checkpointed leaf), and the leaf itself must be present.
    val df = SparkEntry.queries("corpus_quality_calibrate")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val n = "graft_token_hits".r.findAllIn(plan).length
    assert(n == 0,
      s"graft_token_hits appears $n× in the calibration plan — scoring leaked out of its checkpoint:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"checkpointed scored leaf missing from the calibration plan:\n$plan")
  }

  test("bucketed co-located join: zero exchanges before the join") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // tiny fixture tables would broadcast, which ALSO avoids the
    // shuffle but proves nothing about the at-rest layout — force the
    // shuffle-join path so the missing exchanges are bucketing's doing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("join_bucketed_colocated")(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.size == 1,
        s"expected only the aggregation exchange, got ${shuffles.size}:\n$plan")
      assert(shuffles.head.outputPartitioning.toString.contains("o_orderpriority"),
        s"the surviving exchange is not the aggregation's: ${shuffles.head.outputPartitioning}")
      assert(plan.toString.contains("SortMergeJoin"),
        s"bucketed join did not plan as a sort-merge join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("token-budget selection shuffles once, by stratum, scalar columns only") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("corpus_token_budget")(spark, sf("sf0.001"))
      val shuffles = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      // one exchange for the per-source window; the groupBy(source)
      // reuses that partitioning (source = grouping key → no re-shuffle)
      assert(shuffles.size == 1,
        s"expected exactly the source window exchange, got ${shuffles.size}")
      assert(shuffles.head.outputPartitioning.toString.contains("source"),
        s"window exchange not keyed by source: ${shuffles.head.outputPartitioning}")
      assert(!shuffles.head.output.exists(a =>
        a.name == "text" || a.dataType.catalogString.contains("array<")),
        "token-budget selection shuffled text or an array column")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("entity resolution: scalar-only exchanges and a size-guarded block join") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("dedup_entity_fuzzy")(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      // deletion keys explode scan-side: every exchange carries scalar
      // (id, name, blk, bk) strings, never the key array
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      val offenders = shuffles.filter(
        _.output.exists(_.dataType.catalogString.contains("array<")))
      assert(offenders.isEmpty,
        s"entity-resolution exchange carries an array:\n${offenders.mkString("\n")}")
      // the oversize-block guard must be IN the plan feeding the self-
      // join — blocks past maxBlockSize never reach the pairwise stage
      assert(plan.toString.matches("(?s).*Filter.*bsz.*<= 64.*"),
        s"oversize-block guard missing from the plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("substring-span dedup: text never crosses an exchange; the fp join is size-guarded") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("dedup_substring_spans")(spark, sf("sf0.001"))
      val plan = df.queryExecution.executedPlan
      // window fingerprints are computed scan-side: every exchange
      // carries (doc_id, fp[, bsz]) scalars, never document text
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      val offenders = shuffles.filter(_.output.exists(a =>
        a.name == "text" || a.dataType.catalogString.contains("array<")))
      assert(offenders.isEmpty,
        s"document text crossed an exchange:\n${offenders.mkString("\n")}")
      assert(plan.toString.matches("(?s).*Filter.*bsz.*<= 64.*"),
        s"boilerplate-fingerprint guard missing from the plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("partitioned layout: the lang filter prunes at the directory level") {
    val df = SparkEntry.queries("format_partitioned_roundtrip")(spark, sf("sf0.001"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the scan must carry the predicate as a PartitionFilter (directory
    // pruning), not a data Filter over all partitions
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*=[^\\]]*en[^\\]]*\\].*"),
      s"no directory-level pruning on lang:\n$plan")
  }

  test("tf-idf and bigram-LM: model tables broadcast; no exchange carries text or token arrays") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (name <- Seq("vocab_tfidf_top_terms", "corpus_lm_score")) {
        val plan = SparkEntry.queries(name)(spark, sf("sf0.001"))
          .queryExecution.executedPlan
        // df/N (tf-idf) and bigram/unigram/V counts (LM) must ride in as
        // broadcasts — the corpus-sized stream only ever joins map-side
        assert(plan.toString.contains("BroadcastHashJoin") ||
               plan.toString.contains("BroadcastNestedLoopJoin"),
          s"$name: model tables not broadcast:\n$plan")
        val shuffles = plan.collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
        }
        val offenders = shuffles.filter(_.output.exists(a =>
          a.name == "text" || a.dataType.catalogString.contains("array<")))
        assert(offenders.isEmpty,
          s"$name shuffled text or a token array:\n${offenders.mkString("\n")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
