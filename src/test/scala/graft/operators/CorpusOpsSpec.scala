package graft.operators

import graft.SparkSpec
import graft.core.Hashing
import org.apache.spark.sql.functions._

/** Invariants of the corpus-preparation operators that the oracle's
  * corpus-level hash can't see branch-by-branch: chunk accounting in
  * packConcatChunk and the monotone-subset property of stratumKeep. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = Seq(
    // (doc_id, shard, tok) — one shard with exact-boundary hits, one
    // with a giant document spanning several chunks
    (1L, 0, 100L), (2L, 0, 412L), (3L, 0, 100L), (4L, 0, 1200L), (5L, 0, 1L),
    (6L, 1, 512L), (7L, 1, 512L), (8L, 1, 1L)
  ).toDF("doc_id", "shard", "tok")

  test("packConcatChunk assigns each doc to the chunk of its start offset") {
    val out = CorpusOps.packConcatChunk(tokens, "doc_id", "tok", "shard", 512)
      .select("doc_id", "start_tok", "seq").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // shard 0 stream: starts 0, 100, 512, 612, 1812
    // shard 1 stream: starts 0, 512, 1024
    assert(out.toSeq == Seq(
      (1L, 0L, 0L), (2L, 100L, 0L), (3L, 512L, 1L), (4L, 612L, 1L),
      (5L, 1812L, 3L), // the 1200-token doc SPANS chunks 1-3; next doc starts in 3
      (6L, 0L, 0L), (7L, 512L, 1L), (8L, 1024L, 2L)))
  }

  test("packConcatChunk conserves tokens and never reorders within a shard") {
    val out = CorpusOps.packConcatChunk(tokens, "doc_id", "tok", "shard", 512)
    assert(out.agg(sum("tok")).as[Long].head ==
      tokens.agg(sum("tok")).as[Long].head)
    // start_tok of each doc == sum of tok of all earlier docs in the shard
    val bad = out.as[(Long, Int, Long, Long, Long)].collect().count {
      case (id, shard, tok, start, _) =>
        val expect = tokens.filter(col("shard") === shard && col("doc_id") < id)
          .agg(coalesce(sum("tok"), lit(0L))).as[Long].head
        start != expect
    }
    assert(bad == 0)
  }

  test("stratumKeep is a monotone subset: raising a rate only adds rows") {
    val docs = spark.range(500).select(
      col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("stratum"))
    def kept(rate: Int) = docs
      .filter(CorpusOps.stratumKeep(col("doc_id"), col("stratum"),
        Map("0" -> rate), defaultPct = 100))
      .select("doc_id").as[Long].collect().toSet
    val k25 = kept(25); val k60 = kept(60); val k100 = kept(100)
    assert(k25.subsetOf(k60) && k60.subsetOf(k100))
    assert(k100.size == 500)
    // the cut actually bites: strictly between the extremes
    assert(k25.size < k60.size && k60.size < k100.size)
  }

  test("contaminationPairs: docs shorter than n tokens can never pair") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("bench_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota"), // shares the 8-gram
      (11L, "alpha beta gamma"), // 3 tokens — no 8-gram exists
      (12L, "")                  // empty — no tokens at all
    ).toDF("doc_id", "text")
    val out = CorpusOps.contaminationPairs(corpus, bench, "doc_id", "bench_id", "text", n = 8)
      .select("doc_id", "bench_id", "n_shared").as[(Long, Long, Long)].collect()
    // the 8-token bench doc has exactly ONE 8-gram; doc 10 contains it
    assert(out.toSeq == Seq((10L, 1L, 1L)))
  }

  test("stratumKeep matches the md5-bucket definition per stratum") {
    val docs = spark.range(200).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val keep = CorpusOps.stratumKeep(col("doc_id"), col("lang"),
      Map("en" -> 30), defaultPct = 100)
    val rows = docs.select(col("doc_id"), col("lang"), keep.as("keep"),
      Hashing.md5Bucket(col("doc_id"), 100).as("b"))
      .as[(Long, String, Boolean, Long)].collect()
    rows.foreach { case (_, lang, k, b) =>
      assert(k == (if (lang == "en") b < 30 else true))
    }
  }

  test("mixRates: scarcest weighted stratum binds at 100; zero-weight strata drop to 0") {
    val rates = CorpusOps.mixRates(
      Map("en" -> 1000L, "de" -> 100L, "zh" -> 500L),
      Map("en" -> 0.5, "de" -> 0.5))
    // de is the scarcest per unit weight (100/0.5 = 200 < 1000/0.5)
    assert(rates("de") == 100)
    // en is cut to match: total 200 × 0.5 share = 100 of 1000 → 10%
    assert(rates("en") == 10)
    assert(rates("zh") == 0, "no target weight → dropped stratum")
  }

  test("mixRates: kept counts approximate the target shares (downsample-only)") {
    val counts = Map("a" -> 800L, "b" -> 150L, "c" -> 50L)
    val weights = Map("a" -> 0.6, "b" -> 0.3, "c" -> 0.1)
    val rates = CorpusOps.mixRates(counts, weights)
    val kept = counts.map { case (s, c) => s -> c * rates(s) / 100.0 }
    val total = kept.values.sum
    // c binds (50/0.1 = 500); shares of the kept corpus ≈ targets
    // (integer-percent floors cost at most 1% per stratum)
    weights.foreach { case (s, w) =>
      assert(math.abs(kept(s) / total - w) < 0.02,
        s"stratum $s share ${kept(s) / total} vs target $w")
    }
    assert(rates.values.forall(r => r >= 0 && r <= 100))
  }

  test("selectToTokenBudget: keeps best-first within budget, per stratum independently") {
    val docsDf = Seq(
      // (doc_id, src, tok, score) — src A: budget admits the two best
      // docs (300+400=700 ≤ 800) but not the third (+200 > 800)
      (1L, "A", 300L, 0.9), (2L, "A", 400L, 0.8), (3L, "A", 200L, 0.7),
      // src B: the top-ranked doc alone exceeds the budget — the kept
      // set is a PREFIX of the quality-ranked stream, so everything at
      // and below it is excluded too (greedy prefix semantics, same as
      // the oracle's window filter — not best-fit bin packing)
      (4L, "B", 900L, 0.99), (5L, "B", 100L, 0.5)
    ).toDF("doc_id", "src", "tok", "score")
    val kept = CorpusOps.selectToTokenBudget(docsDf, "src", "score", "doc_id", "tok", 800L)
      .select("doc_id", "cum_tok").as[(Long, Long)].collect().toMap
    assert(kept.keySet == Set(1L, 2L))
    assert(kept(2L) == 700L, "running total must accumulate in score-desc order")
  }

  test("selectToTokenBudget plan: one stratum-keyed exchange, no global sort") {
    // the stratum-cardinality contract (docstring): the cumsum window
    // partitions by the stratum ONLY — parallelism = |strata|, each
    // task a streaming rows-frame over scalars. Pin that the plan
    // sorts/partitions per stratum and never globally.
    val docsDf = Seq(
      (1L, "A", 300L, 0.9), (2L, "A", 400L, 0.8), (4L, "B", 900L, 0.99)
    ).toDF("doc_id", "src", "tok", "score")
    val out = CorpusOps.selectToTokenBudget(docsDf, "src", "score", "doc_id", "tok", 800L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(src".r.findFirstIn(plan).isDefined,
      s"cumsum exchange not keyed by the stratum:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"a global sort crept into the budget cut:\n$plan")
    assert("Window \\[.*partitionBy|windowspecdefinition\\(src".r.findFirstIn(plan).isDefined,
      s"window not partitioned by the stratum:\n$plan")
  }

  test("tfIdfTopTerms: hand-computed scores, rank order, and tie-break") {
    val docsDf = Seq(
      (1L, "a a b"),   // tf a=2 b=1
      (2L, "a c"),     // tf a=1 c=1 — a/c tie on tfidf, term breaks it
      (3L, "c c c d")  // tf c=3 d=1
    ).toDF("doc_id", "text")
    val out = CorpusOps.tfIdfTopTerms(docsDf, "doc_id", "text", k = 2)
      .select("doc_id", "term", "tfidf", "term_rank")
      .as[(Long, String, Double, Long)].collect().toSet
    // N=3; df: a=2 b=1 c=2 d=1; ln(3/2)=0.405465, ln(3)=1.098612 (6 dp)
    assert(out == Set(
      (1L, "b", 1.098612, 1L), (1L, "a", 0.81093, 2L),
      (2L, "a", 0.405465, 1L), (2L, "c", 0.405465, 2L),
      (3L, "c", 1.216395, 1L), (3L, "d", 1.098612, 2L)))
  }

  test("trainQualityWeights: learns a separable signal, deterministic, loud-bounded") {
    // labels separable by length alone: long docs (x1 → 1.0) positive,
    // short negative — repeated so the gradient is well-conditioned
    val docsDf = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, Array.fill(120)("the good data").mkString(" "), 1.0)
      else (i, "x y", 0.0)
    }.toDF("doc_id", "text", "y")
    val w = CorpusOps.trainQualityWeights(docsDf, "text", col("y") === 1.0,
      iters = 20, lr = 2.0)
    // the length feature must have learned a positive weight
    assert(w(1) > 0, s"length weight should be positive after training: $w")
    // trained scoring separates the classes completely
    val scored = CorpusOps.scoreTrainedQuality(docsDf, "doc_id", "text", w)
      .join(docsDf.select("doc_id", "y"), "doc_id")
    val acc = scored.filter((col("score") >= 0.5) === (col("y") === 1.0)).count()
    assert(acc == 40, s"expected full separation, got $acc/40\nweights: $w")
    // the trajectory is deterministic: a second training run is identical
    val w2 = CorpusOps.trainQualityWeights(docsDf, "text", col("y") === 1.0,
      iters = 20, lr = 2.0)
    assert(w == w2)
    // every weight sits on the 6-dp grid (the cross-engine pin)
    assert(w.forall(v => BigDecimal(v).scale <= 6), s"off-grid weight: $w")
    intercept[IllegalArgumentException] {
      CorpusOps.trainQualityWeights(docsDf, "text", col("y") === 1.0,
        iters = 51, lr = 2.0)
    }
  }

  test("bm25TopK: hand-computed scores, dedup'd query terms, rank and k cut") {
    val docsDf = Seq(
      (1L, "a a b"),   // dl=3
      (2L, "a c"),     // dl=2
      (3L, "c c c d")  // dl=4
    ).toDF("doc_id", "text")
    // query 1 repeats 'a' — set semantics must score it once;
    // query 2 has no match in doc 2 — that doc must be absent
    val probes = Seq((1L, "a c a"), (2L, "b d")).toDF("query_id", "query_text")
    val out = CorpusOps.bm25TopK(docsDf, "doc_id", "text", probes, k = 2)
      .select("query_id", "doc_rank", "doc_id", "bm25")
      .as[(Long, Long, Long, Double)].collect().toSet
    // N=3 avgdl=3; df: a=2 b=1 c=2 d=1; idf(2)=ln(1.6) idf(1)=ln(8/3);
    // norm(dl) = 1.2*(0.25+0.75*dl/3); values 6 dp (verified offline):
    // q1: doc2 = 2*ln(1.6)*2.2/1.9 = 1.088429 > doc3 0.689339 > doc1
    // 0.646255 (cut by k=2); q2: doc1 0.980829 > doc3 0.86313
    assert(out == Set(
      (1L, 1L, 2L, 1.088429), (1L, 2L, 3L, 0.689339),
      (2L, 1L, 1L, 0.980829), (2L, 2L, 3L, 0.86313)))
    // k=1 keeps only the leaders
    val top1 = CorpusOps.bm25TopK(docsDf, "doc_id", "text", probes, k = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(top1 == Set((1L, 2L), (2L, 1L)))
  }

  test("learnBpeMerges: the classic hug/pug/hugs trace, merge-by-merge") {
    // word frequencies: hug×10 pug×5 hugs×5 (docs carry the repeats)
    val docsDf = Seq(
      (1L, Array.fill(10)("hug").mkString(" ")),
      (2L, Array.fill(5)("pug").mkString(" ")),
      (3L, Array.fill(5)("hugs").mkString(" "))
    ).toDF("doc_id", "text")
    val merges = CorpusOps.learnBpeMerges(docsDf, "text", k = 3)
    // pairs: (h,u)=15 (u,g)=20 (p,u)=5 (g,s)=5 → merge (u,g) 20
    // then (h,ug)=15 (p,ug)=5 (ug,s)=5       → merge (h,ug) 15
    // then (hug,s)=5 (p,ug)=5 — tie, "hug"<"p" → merge (hug,s) 5
    assert(merges == Seq(("u", "g", 20L), ("h", "ug", 15L), ("hug", "s", 5L)))
  }

  test("applyBpePieceCounts: the trained rules segment the training corpus correctly") {
    val docsDf = Seq(
      (1L, Array.fill(10)("hug").mkString(" ")),
      (2L, Array.fill(5)("pug").mkString(" ")),
      (3L, Array.fill(5)("hugs").mkString(" ")),
      (4L, "hug pug hugs")
    ).toDF("doc_id", "text")
    val merges = CorpusOps.learnBpeMerges(docsDf, "text", k = 3)
      .map { case (a, b, _) => (a, b) }
    // under [(u,g),(h,ug),(hug,s)]: hug→[hug](1) pug→[p,ug](2) hugs→[hugs](1)
    assert(CorpusOps.segmentBpe("hug", merges) == Seq("hug"))
    assert(CorpusOps.segmentBpe("pug", merges) == Seq("p", "ug"))
    assert(CorpusOps.segmentBpe("hugs", merges) == Seq("hugs"))
    assert(CorpusOps.segmentBpe("unseen", merges) == Seq("u", "n", "s", "e", "e", "n"))
    val out = CorpusOps.applyBpePieceCounts(docsDf, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((10L, 10L)), "ten hug tokens, one piece each")
    assert(out(2L) == ((5L, 10L)), "five pug tokens, two pieces each")
    assert(out(4L) == ((3L, 4L)), "hug(1) + pug(2) + hugs(1)")
  }

  test("vocab_bpe_apply on the fixture: pieces bounded by tokens below, characters above") {
    val d = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val merges = CorpusOps.learnBpeMerges(d, "text", k = 10)
      .map { case (a, b, _) => (a, b) }
    val out = CorpusOps.applyBpePieceCounts(d, "doc_id", "text", merges)
    val viol = out
      .join(d.select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars")), "doc_id")
      .filter(col("n_pieces") < col("n_tokens") || col("n_pieces") > col("n_chars"))
      .count()
    assert(viol == 0, "piece counts outside [n_tokens, n_chars]")
    // the rules must actually bite (pieces < chars) without collapsing
    // everything to whole words (pieces > tokens) — 10 merges over this
    // vocabulary land strictly between the two extremes
    val agg = out
      .join(d.select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars")), "doc_id")
      .agg(sum("n_pieces"), sum("n_tokens"), sum("n_chars"))
      .as[(Long, Long, Long)].head()
    assert(agg._1 > agg._2 && agg._1 < agg._3,
      s"pieces ${agg._1} should sit strictly between tokens ${agg._2} and chars ${agg._3}")
  }

  test("applyBpePieceCounts builds its plan without running any job (no driver vocab collect)") {
    // the round-5 implementation collected the full distinct vocabulary
    // to the driver WHILE CONSTRUCTING the frame — at web scale a
    // driver-OOM. The distributed form segments the vocabulary inside a
    // mapPartitions stage, so frame construction must launch ZERO jobs.
    // range-backed (NOT Seq.toDF — that plants its own LocalTableScan
    // leaf and would false-trip the assertion below)
    val docsDf = spark.range(4).select(col("id").as("doc_id"),
      concat(lit("hug pug hugs word"), col("id").cast("string")).as("text"))
    docsDf.count() // materialize inputs before arming the listener
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = CorpusOps.applyBpePieceCounts(docsDf, "doc_id", "text",
        Seq(("u", "g"), ("h", "ug")))
      // sentinel drain: run a known single-job action AFTER the build —
      // the listener bus is FIFO, so once the sentinel's start event
      // arrives, any job the builder ran would already be counted (a
      // fixed sleep is both slower and racier)
      spark.sparkContext.parallelize(Seq(1)).count()
      val deadline = System.currentTimeMillis() + 30000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(jobs.get() == 1,
        s"building the apply frame ran ${jobs.get() - 1} job(s) — a driver-side collect is back")
      val plan = out.queryExecution.executedPlan.toString
      // the distributed segmentation is in the plan, not the driver: a
      // collected vocabulary would surface as a LocalTableScan leaf
      assert(plan.contains("MapPartitions"),
        "vocabulary segmentation is not a mapPartitions stage")
      assert(!plan.contains("LocalTableScan"),
        "a driver-materialized (collected) vocabulary leaf is back in the plan")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("learnBpeMerges minFreq floor: rare words are dropped before the driver collect") {
    val docsDf = Seq(
      (1L, Array.fill(10)("hug").mkString(" ")),
      (2L, Array.fill(5)("pug").mkString(" ")),
      (3L, "zzzzz") // frequency 1 — below a minFreq=2 floor
    ).toDF("doc_id", "text")
    val floored = CorpusOps.learnBpeMerges(docsDf, "text", k = 5, minFreq = 2L)
    assert(!floored.exists { case (a, b, _) => a.contains("z") || b.contains("z") },
      s"rare word leaked into the trainer: $floored")
    // without the floor the rare word's (z,z) pairs do surface
    val unfloored = CorpusOps.learnBpeMerges(docsDf, "text", k = 5)
    assert(unfloored.exists { case (a, b, _) => a.contains("z") || b.contains("z") },
      s"fixture no longer exercises the floor: $unfloored")
  }

  test("learnBpeMerges maxVocab cap: the driver holds at most V words, most-frequent first") {
    val docsDf = Seq(
      (1L, Array.fill(10)("hug").mkString(" ")),
      (2L, Array.fill(5)("pug").mkString(" ")),
      (3L, "zzzzz") // frequency 1 — the least frequent word
    ).toDF("doc_id", "text")
    // V=2 keeps hug and pug; the rare word is truncated even at
    // minFreq=1 (the cap is unconditional, unlike the floor)
    val capped = CorpusOps.learnBpeMerges(docsDf, "text", k = 5, maxVocab = 2)
    assert(!capped.exists { case (a, b, _) => a.contains("z") || b.contains("z") },
      s"word past the vocab cap leaked into the trainer: $capped")
    // the kept words train identically to the uncapped run on them
    val kept = CorpusOps.learnBpeMerges(
      docsDf.filter(col("doc_id") =!= 3L), "text", k = 5)
    assert(capped == kept, s"cap changed surviving words' merges: $capped vs $kept")
    intercept[IllegalArgumentException] {
      CorpusOps.learnBpeMerges(docsDf, "text", k = 5, maxVocab = 0)
    }
  }

  test("viterbiSegment: hand-traced decodes — argmax, exact-score ties, floor fallback") {
    val lp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.5, "abc" -> -1.2, "c" -> -3.0)
    // whole-word piece beats any split: abc = -1.2 vs ab+c = -4.0
    assert(CorpusOps.viterbiSegment("abc", lp, -10.0, 4) == Seq("abc"))
    assert(CorpusOps.viterbiSegment("abab", lp, -10.0, 4) == Seq("ab", "ab"))
    // EXACT score tie (aa = -2.0 either way) → lexicographically
    // smallest piece list wins: ["a","a"] < ["aa"]
    val tie = Map("aa" -> -2.0, "a" -> -1.0)
    assert(CorpusOps.viterbiSegment("aa", tie, -10.0, 4) == Seq("a", "a"))
    // unseen single code point falls back to the floor, never fails
    assert(CorpusOps.viterbiSegment("az", lp, -10.0, 4) == Seq("a", "z"))
    assert(CorpusOps.viterbiSegment("", lp, -10.0, 4) == Seq.empty)
  }

  test("trainUnigramLm: coverage singles survive pruning; probs are the smoothed counts") {
    val d = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val vocab = CorpusOps.trainUnigramLm(d, "text", vocabSize = 32,
      emRounds = 2, maxPieceLen = 4, seedSize = 64)
    val singles = d.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(split(col("w"), "")).as("c")).distinct()
      .as[String].collect().toSet
    val pieceSet = vocab.pieces.map(_._1).toSet
    assert(singles.subsetOf(pieceSet),
      s"coverage broken — missing singles: ${singles -- pieceSet}")
    assert(vocab.pieces.size <= 32 + singles.size)
    // every logp is exactly the 6-dp smoothed count ratio, and the
    // floor is the zero-count case of the same formula
    val t = vocab.pieces.map(_._2).sum.toDouble
    val v = vocab.pieces.size.toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    vocab.pieces.foreach { case (p, c, l) =>
      assert(l == r6(math.log((c + 1.0) / (t + v))), s"logp drifted for $p") }
    assert(vocab.floorLogp == r6(math.log(1.0 / (t + v))))
    // multi-code-point pieces actually trained in (not a char model)
    assert(vocab.pieces.exists(p => p._1.length > 1 && p._2 > 0),
      "no multi-cp piece survived — EM learned nothing")
  }

  test("applyUnigramPieceCounts builds its plan without running any job") {
    val d = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val vocab = CorpusOps.trainUnigramLm(d, "text", vocabSize = 16,
      emRounds = 1, maxPieceLen = 4, seedSize = 32)
    val docsDf = spark.range(4).select(col("id").as("doc_id"),
      concat(lit("hug pug hugs word"), col("id").cast("string")).as("text"))
    docsDf.count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = CorpusOps.applyUnigramPieceCounts(docsDf, "doc_id", "text", vocab)
      spark.sparkContext.parallelize(Seq(1)).count() // FIFO sentinel drain
      val deadline = System.currentTimeMillis() + 30000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(jobs.get() == 1,
        s"building the apply frame ran ${jobs.get() - 1} job(s)")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("MapPartitions"),
        "vocabulary segmentation is not a mapPartitions stage")
      assert(!plan.contains("LocalTableScan"),
        "a driver-materialized vocabulary leaf is in the plan")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bpePieceFrequencies: hand-computed vocabulary totals, rank and tie order") {
    val docsDf = Seq(
      (1L, Array.fill(10)("hug").mkString(" ")),
      (2L, Array.fill(5)("pug").mkString(" ")),
      (3L, Array.fill(5)("hugs").mkString(" "))
    ).toDF("doc_id", "text")
    val merges = CorpusOps.learnBpeMerges(docsDf, "text", k = 3)
      .map { case (a, b, _) => (a, b) }
    // segmentations: hug→[hug]×10, pug→[p,ug]×5, hugs→[hugs]×5
    val out = CorpusOps.bpePieceFrequencies(docsDf, "text", merges, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("hug", 10L), ("hugs", 5L), ("p", 5L), ("ug", 5L)),
      s"got $out")
    // the cut is a real top-k, ties broken on the piece string
    assert(CorpusOps.bpePieceFrequencies(docsDf, "text", merges, k = 2)
      .as[(String, Long)].collect().toSeq == Seq(("hug", 10L), ("hugs", 5L)))
  }

  test("packLengthBucketed: power-of-2 buckets, id-ordered batches, exact pad efficiency") {
    val docsDf = Seq(
      // (doc_id, tok): buckets — 1→b0(pad 1); 2→b1(pad 2); 3,4→b2(pad 4); 5→b3(pad 8)
      (1L, 2L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 5L), (6L, 2L)
    ).toDF("doc_id", "tok")
    // shards = 1 isolates the bucket/batch semantics (shard ≡ 0)
    val out = CorpusOps.packLengthBucketed(docsDf, "doc_id", "tok", maxBatch = 2, shards = 1)
      .select("bucket", "shard", "batch", "n_docs", "n_tokens", "max_tokens", "first_doc", "pad_efficiency")
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      // bucket 0 (pad 1): the single-token doc — padding-free, NOT
      // merged into the 2-token bucket (the bin(0)='0' edge)
      (0L, 0L, 0L, 1L, 1L, 1L, 2L, 1.0),
      // bucket 1 (pad 2): docs 1,6
      (1L, 0L, 0L, 2L, 4L, 2L, 1L, 1.0),
      // bucket 2 (pad 4): docs 3,4
      (2L, 0L, 0L, 2L, 7L, 4L, 3L, 0.875),   // 7 / 8
      // bucket 3 (pad 8): doc 5
      (3L, 0L, 0L, 1L, 5L, 5L, 5L, 0.625)),  // 5 / 8
      s"got $out")
  }

  test("packLengthBucketed: sharded batches refine the unsharded ones deterministically") {
    val docsDf = (1L to 200L).map(i => (i, (i % 13) + 1)).toDF("doc_id", "tok")
    val sharded = CorpusOps.packLengthBucketed(docsDf, "doc_id", "tok", maxBatch = 4, shards = 8)
      .select("bucket", "shard", "n_docs", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    // every doc lands in exactly one (bucket, shard) batch: per-bucket
    // doc and token totals equal the unsharded run's — sharding only
    // REFINES the grouping, it never drops or duplicates rows
    val unsharded = CorpusOps.packLengthBucketed(docsDf, "doc_id", "tok", maxBatch = 4, shards = 1)
      .groupBy("bucket").agg(sum("n_docs").as("d"), sum("n_tokens").as("t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val byBucket = sharded.groupBy(_._1).map { case (b, rows) =>
      b -> ((rows.map(_._3).sum, rows.map(_._4).sum))
    }
    assert(byBucket == unsharded, s"sharded totals drifted: $byBucket vs $unsharded")
    // the md5 shard key actually spreads the biggest bucket's window
    // across >1 partition (the whole point of the shard)
    assert(sharded.map(r => (r._1, r._2)).distinct.groupBy(_._1).values.exists(_.size > 1),
      "no bucket used more than one shard — shard key not spreading")
    // rerun is bit-identical (deterministic hash, no RNG)
    val rerun = CorpusOps.packLengthBucketed(docsDf, "doc_id", "tok", maxBatch = 4, shards = 8)
      .select("bucket", "shard", "n_docs", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(rerun.toSet == sharded.toSet)
  }

  test("learnBpeMerges stops early when no pairs remain") {
    val docsDf = Seq((1L, "a b a")).toDF("doc_id", "text")
    // single-char words have no adjacent pairs at all
    assert(CorpusOps.learnBpeMerges(docsDf, "text", k = 5).isEmpty)
  }

  test("snapshotDiff: added/removed/changed/unchanged accounting per stratum") {
    val before = Seq(
      (1L, "s1", "a"), (2L, "s1", "b"), (3L, "s2", "c"), (4L, "s2", "d")
    ).toDF("doc_id", "source", "text")
    val after = Seq(
      (2L, "s1", "b-edited"), (3L, "s2", "c"), (4L, "s2", "d"), (5L, "s1", "e")
    ).toDF("doc_id", "source", "text")
    val out = CorpusOps.snapshotDiff(before, after, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("s1") == ((1L, 1L, 1L, 0L)), s"s1: ${out("s1")}") // +5, -1, ~2
    assert(out("s2") == ((0L, 0L, 0L, 2L)), s"s2: ${out("s2")}")
  }

  test("bigramLmScore: hand-computed add-one bigram log-probs; short docs absent") {
    val docsDf = Seq(
      (1L, "a b a"), // bigrams (a,b) (b,a)
      (2L, "a b"),   // bigram  (a,b)
      (3L, "c")      // no bigrams → absent from the result
    ).toDF("doc_id", "text")
    val out = CorpusOps.bigramLmScore(docsDf, "doc_id", "text")
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    // unigrams a=3 b=2 c=1 → V=3; C(a,b)=2 C(b,a)=1
    // P(b|a)=(2+1)/(3+3)=0.5 → ln=-0.693147; P(a|b)=(1+1)/(2+3)=0.4 → ln=-0.916291
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((2L, -0.804719)), "mean of ln(0.5), ln(0.4)")
    assert(out(2L) == ((1L, -0.693147)))
  }

  test("repeatRates anchors at the abundant stratum; upsampleByRate explodes exactly") {
    // en is at/above its share → anchor (rate 100 = 1 epoch, nothing
    // downsampled); code is scarce → repeated; zero-weight drops
    val rates = CorpusOps.repeatRates(
      Map("en" -> 800L, "code" -> 100L, "junk" -> 50L),
      Map("en" -> 0.8, "code" -> 0.2, "junk" -> 0.0))
    assert(rates("en") == 100, s"anchor stratum must get exactly 1.0 epochs: $rates")
    assert(rates("code") == 200, s"code wants 2 epochs to hit 20%: $rates")
    assert(rates("junk") == 0)

    val df = (0 until 100).map(i => (i.toLong, if (i < 80) "en" else "code"))
      .toDF("doc_id", "stratum")
    val out = CorpusOps.upsampleByRate(df, "doc_id", "stratum",
        Map("en" -> 100, "code" -> 250, "zz" -> 0))
      .as[(Long, String, Long)].collect()
    // en: exactly 1 copy each; code: 2 + ~50% bernoulli via md5 bucket
    assert(out.count(_._2 == "en") == 80)
    val codeCopies = out.filter(_._2 == "code")
    assert(codeCopies.groupBy(_._1).values.forall(c => c.length == 2 || c.length == 3))
    // copy indices are dense from 0 per doc
    out.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._3).sorted.sameElements(0L until rows.length))
    }
    // deterministic: rerun is identical
    val rerun = CorpusOps.upsampleByRate(df, "doc_id", "stratum",
        Map("en" -> 100, "code" -> 250, "zz" -> 0))
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(r => (r._1, r._3)).sameElements(rerun.sortBy(r => (r._1, r._3))))
    // zero-rate stratum rows vanish entirely
    val zeroed = CorpusOps.upsampleByRate(df, "doc_id", "stratum", Map("en" -> 0, "code" -> 100))
    assert(zeroed.filter(col("stratum") === "en").count() == 0)
  }

  test("removeBoilerplateLines: recurring lines vanish, unique prose survives, edges hold") {
    val docsDf = Seq(
      (1L, "FOOTER\nunique one\nFOOTER"),
      (2L, "unique two\nFOOTER"),
      (3L, "FOOTER"),          // all boilerplate → empty, not dropped
      (4L, "only prose here")
    ).toDF("doc_id", "text")
    val out = CorpusOps.removeBoilerplateLines(docsDf, "doc_id", "text", "\n", minDocs = 3)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("unique one", 2L)))
    assert(out(2L) == (("unique two", 1L)))
    assert(out(3L) == (("", 1L)), "an all-boilerplate doc must come back empty, not dropped")
    assert(out(4L) == (("only prose here", 0L)))
    // below threshold: nothing qualifies, everything passes through
    val none = CorpusOps.removeBoilerplateLines(docsDf, "doc_id", "text", "\n", minDocs = 4)
      .as[(Long, String, Long)].collect()
    assert(none.forall(_._3 == 0L), "no line recurs in 4 docs — nothing may be removed")
    intercept[IllegalArgumentException] {
      CorpusOps.removeBoilerplateLines(docsDf, "doc_id", "text", "\n",
        minDocs = 3, maxBoilerLines = 0)
    }
  }

  test("removeBoilerplateLines: >1k boiler lines take the broadcast probe, same answer") {
    // 1,200 distinct boiler lines, each in 2 docs; every doc keeps one
    // unique prose line — large enough to cross broadcastAbove's default
    val docsDf = (0 until 1200).flatMap { i =>
      Seq((i * 2L, s"boiler line $i\nprose ${i * 2}"),
        (i * 2 + 1L, s"prose ${i * 2 + 1}\nboiler line $i"))
    }.toDF("doc_id", "text")
    val out = CorpusOps.removeBoilerplateLines(docsDf, "doc_id", "text", "\n", minDocs = 2)
      .as[(Long, String, Long)].collect()
    assert(out.length == 2400)
    assert(out.forall { case (id, clean, removed) =>
      clean == s"prose $id" && removed == 1L
    }, "every doc must lose exactly its boiler line and keep its prose")
    // the two paths agree bit-for-bit on the same input
    val viaLiteral = CorpusOps.removeBoilerplateLines(docsDf, "doc_id", "text", "\n",
        minDocs = 2, broadcastAbove = Int.MaxValue)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).sameElements(viaLiteral.sortBy(_._1)),
      "broadcast-probe path diverged from the literal-array path")
  }

  test("epochOrder: a true permutation, bit-stable per (seed, epoch), fresh per epoch") {
    val docsDf = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val n = docsDf.count()
    val e2 = CorpusOps.epochOrder(docsDf, "doc_id", seed = 7L, epoch = 2)
      .as[(Long, Int, Long)].collect()
    // permutation: every doc exactly once, per-shard positions contiguous from 1
    assert(e2.length == n && e2.map(_._1).distinct.length == n)
    e2.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length),
        s"shard $shard positions not contiguous")
    }
    // bit-stable on rerun; reshuffled by epoch and by seed
    val rerun = CorpusOps.epochOrder(docsDf, "doc_id", seed = 7L, epoch = 2)
      .as[(Long, Int, Long)].collect()
    assert(e2.sortBy(_._1).sameElements(rerun.sortBy(_._1)))
    val e3 = CorpusOps.epochOrder(docsDf, "doc_id", seed = 7L, epoch = 3)
      .as[(Long, Int, Long)].collect()
    assert(e2.sortBy(_._1).map(r => (r._2, r._3)).toSeq !=
      e3.sortBy(_._1).map(r => (r._2, r._3)).toSeq,
      "epoch 3 produced the same order as epoch 2")
  }

  test("count-min: est >= truth for every token, overestimates bounded by collision mass") {
    val docsDf = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val exact = docsDf
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val est = CorpusOps.cmHeavyHitters(docsDf, "text", k = exact.size + 10)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet, "estimates must cover exactly the distinct tokens")
    // the one-sided CM guarantee: never an underestimate
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"CM underestimated '$t': ${est(t)} < $n")
    }
    // overestimate bound: E[error] = collision mass ≈ N/width per row;
    // min over 4 independent rows keeps the worst observed error well
    // under a few multiples of that
    val totalN = exact.values.sum
    val bound = 8.0 * totalN / 256
    val worst = exact.map { case (t, n) => est(t) - n }.max
    assert(worst <= bound, s"worst overestimate $worst exceeds ${bound.toInt}")
  }

  test("count-min sketches merge by addition: sharded build == whole-corpus build") {
    val docsDf = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val whole = CorpusOps.countMinSketch(docsDf, "text")
      .as[(Int, Long, Long)].collect().map { case (d, b, c) => (d, b) -> c }.toMap
    val half1 = CorpusOps.countMinSketch(docsDf.filter(col("doc_id") % 2 === 0), "text")
      .as[(Int, Long, Long)].collect().map { case (d, b, c) => (d, b) -> c }.toMap
    val half2 = CorpusOps.countMinSketch(docsDf.filter(col("doc_id") % 2 === 1), "text")
      .as[(Int, Long, Long)].collect().map { case (d, b, c) => (d, b) -> c }.toMap
    val merged = (half1.keySet ++ half2.keySet).map { k =>
      k -> (half1.getOrElse(k, 0L) + half2.getOrElse(k, 0L))
    }.toMap
    assert(merged == whole, "counter-wise sum of shard sketches must equal the corpus sketch")
  }

  test("temperatureShares: α=1 keeps the natural mix, α=0 is uniform, α=0.3 boosts the tail") {
    val corpus = Seq(
      (1L, "en", "a b c d e f g h i j k l m n o p"), // 16 tokens
      (2L, "en", "a b c d e f g h i j k l m n o p"),
      (3L, "de", "x y z w")) // 4 tokens — the tail language
      .toDF("doc_id", "lang", "text")
    def shares(alpha: Double) =
      CorpusOps.temperatureShares(corpus, "lang", "text", alpha)
        .select("lang", "raw_share", "temp_share", "boost")
        .as[(String, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
    val s1 = shares(1.0)
    s1.values.foreach { case (_, raw, temp, boost) =>
      assert(math.abs(raw - temp) < 1e-9 && math.abs(boost - 1.0) < 1e-3)
    }
    val s0 = shares(0.0)
    s0.values.foreach { case (_, _, temp, _) => assert(math.abs(temp - 0.5) < 1e-9) }
    val s3 = shares(0.3)
    assert(s3("de")._4 > 1.0, "tail language must be boosted")
    assert(s3("en")._4 < 1.0, "head language must be damped")
    // shares always renormalize
    assert(math.abs(s3.values.map(_._3).sum - 1.0) < 1e-5)
    assert(math.abs(s3.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("jsDivergenceBySource: single source is 0; values match the naive full-vocab formula") {
    val single = Seq((1L, "web", "a b c a")).toDF("doc_id", "source", "text")
    val s = CorpusOps.jsDivergenceBySource(single, "source", "text")
      .select("covered_mass", "js").as[(Double, Double)].head()
    assert(s == ((1.0, 0.0)), s"source == corpus must give (1, 0): $s")

    // independent naive recomputation over the FULL vocab (the V×S
    // expansion the operator's closed form avoids)
    val corpus = Seq(
      (1L, "web", "a a b c"),
      (2L, "web", "a d"),
      (3L, "book", "b b e e e"),
      (4L, "book", "a")).toDF("doc_id", "source", "text")
    val counts: Map[(String, String), Long] = corpus
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .as[(String, String)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val vocab = counts.keySet.map(_._2)
    val bySource = counts.keySet.map(_._1)
    val nTotal = counts.values.sum.toDouble
    val expect = bySource.map { src =>
      val n = counts.collect { case ((s2, _), c) if s2 == src => c }.sum.toDouble
      val js = vocab.toSeq.map { t =>
        val p = counts.getOrElse((src, t), 0L) / n
        val q = counts.collect { case ((_, t2), c) if t2 == t => c }.sum / nTotal
        val m = (p + q) / 2
        (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) + 0.5 * q * math.log(q / m)
      }.sum
      src -> BigDecimal(js).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = CorpusOps.jsDivergenceBySource(corpus, "source", "text")
      .select("source", "js").as[(String, Double)].collect().toMap
    assert(got == expect, s"closed-form result $got != naive $expect")
    got.values.foreach(v => assert(v >= 0 && v <= math.log(2.0) + 1e-9))
  }

  test("dedupParagraphsGlobal: first occurrence survives, order holds, short lines exempt") {
    val corpus = Seq(
      (1L, "unique alpha\nSHARED PARAGRAPH HERE\n--\nclosing one"),
      (2L, "SHARED PARAGRAPH HERE\nunique beta\n--"),
      (3L, "SHARED PARAGRAPH HERE")) // entirely duplicate text
      .toDF("doc_id", "text")
    val out = CorpusOps.dedupParagraphsGlobal(corpus, "doc_id", "text", "\n", minLen = 5)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "unique alpha\nSHARED PARAGRAPH HERE\n--\nclosing one", 0L)),
      "doc 1 owns the first occurrence and keeps everything")
    assert(out(1) == ((2L, "unique beta\n--", 1L)),
      "doc 2 loses the shared paragraph but keeps its short separator in place")
    assert(out(2) == ((3L, "", 1L)),
      "an all-duplicate doc comes back empty, not dropped")
  }

  test("dedupParagraphsGlobal is idempotent: a second pass removes nothing") {
    val docsDf = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"),
        concat(col("text"), lit("\nPROMO "), (col("doc_id") % 5).cast("string")).as("text"))
    val once = CorpusOps.dedupParagraphsGlobal(docsDf, "doc_id", "text", "\n")
    assert(once.agg(sum("n_removed")).as[Long].head() > 0, "the promo must actually dedup")
    val twice = CorpusOps.dedupParagraphsGlobal(
      once.select(col("doc_id"), col("clean_text").as("text")), "doc_id", "text", "\n")
    assert(twice.agg(sum("n_removed")).as[Long].head() == 0L,
      "a deduped corpus has no recurring paragraphs left")
  }

  test("dsirSelect enriches the target domain: en-targeted selection beats the base rate") {
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val k = 30
    val sel = CorpusOps.dsirSelect(d, d.filter(col("lang") === "en"),
      "doc_id", "text", k = k, buckets = 256)
    val ids = sel.select("doc_id").as[Long].collect().toSet
    assert(ids.size == k)
    val selEn = d.filter(col("doc_id").isin(ids.toSeq: _*) &&
      col("lang") === "en").count().toDouble / k
    val baseEn = d.filter(col("lang") === "en").count().toDouble / d.count()
    assert(selEn > baseEn,
      s"selection must enrich the target domain: $selEn vs base $baseEn")
    assert(selEn >= 0.6, s"en-targeted selection only $selEn en")
    // weights are 6-dp rounded and the rank order is (weight desc, id)
    val rows = sel.select("sel_rank", "dsir_weight", "doc_id")
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._3 < b._3) },
      "selection not ordered by (weight desc, id)")
  }

  test("dsirSelectThreshold selects exactly dsirSelect's set at every bracket regime") {
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val tgt = d.filter(col("lang") === "en")
    // tight bracket (first attempt valid), loose bracket (forces the
    // widening walk at 500 docs), and k ≥ n (the take-all early exit)
    for ((k, relErr) <- Seq((200L, 0.01), (123L, 0.0005), (5000L, 0.01))) {
      val want = CorpusOps.dsirSelect(d, tgt, "doc_id", "text",
        k = math.min(k, (1 << 22).toLong).toInt, buckets = 256)
        .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toSet
      val got = CorpusOps.dsirSelectThreshold(d, tgt, "doc_id", "text",
        k = k, buckets = 256, relErr = relErr)
        .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toSet
      assert(got == want, s"threshold cut diverged at k=$k relErr=$relErr")
    }
  }

  test("dsir loud bounds: driver-merge k cap, degenerate-tie boundary cap") {
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val tgt = d.filter(col("lang") === "en")
    val e1 = intercept[IllegalArgumentException] {
      CorpusOps.dsirSelect(d, tgt, "doc_id", "text", k = (1 << 22) + 1)
    }
    assert(e1.getMessage.contains("dsirSelectThreshold"),
      "the refusal must name the corpus-fraction remedy")
    // a constant corpus → every weight identical → no quantile can
    // separate → the boundary slice is the whole corpus and must trip
    // the loud maxBoundary bound, naming the degeneracy
    val const = d.select(col("doc_id"), lit("same text here").as("text"))
    val e2 = intercept[IllegalArgumentException] {
      CorpusOps.dsirSelectThreshold(const, const.limit(10), "doc_id", "text",
        k = 50L, buckets = 256, maxBoundary = 100L).collect()
    }
    assert(e2.getMessage.contains("arbitrary-by-tie"),
      s"degenerate-tie refusal missing: ${e2.getMessage}")
  }

  test("bm25TopKLarge ≡ bm25TopK when the df cap doesn't bite; capped drops only hot terms") {
    val d = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text")
    val probes = Seq((1L, "vector scan filter"), (2L, "customer order join"))
      .toDF("query_id", "query_text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double)].collect().toSet
    // an un-binding cap (maxDf ≥ N) changes nothing but the join plan
    val uncapped = rows(CorpusOps.bm25TopKLarge(d, "doc_id", "text",
      probes, k = 10, maxDf = 1000000L))
    val serving = rows(CorpusOps.bm25TopK(d, "doc_id", "text", probes, k = 10))
    assert(uncapped == serving,
      "shuffle-join sweep diverged from the serving plan at an un-binding cap")
    // a binding cap re-scores: results may differ, but only through the
    // dropped hot terms — every kept term still scores identically, so
    // a query whose terms are ALL under the cap is unchanged
    val dfs = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
      .groupBy("term").count().as[(String, Long)].collect().toMap
    val allUnder = probes.as[(Long, String)].collect().filter {
      case (_, t) => t.split(" ").forall(w => dfs.getOrElse(w, 0L) <= 300L)
    }.map(_._1).toSet
    if (allUnder.nonEmpty) {
      val capped = rows(CorpusOps.bm25TopKLarge(d, "doc_id", "text",
        probes, k = 10, maxDf = 300L))
      assert(capped.filter(r => allUnder(r._1)) ==
        serving.filter(r => allUnder(r._1)),
        "the cap changed a query none of whose terms it dropped")
    }
  }

  test("rrfFuse: hand-computed fusion, absent-from-one-ranking contributes nothing") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = CorpusOps.rrfFuse(a, b, "doc_id", k = 10)
      .select("query_id", "fused_rank", "doc_id", "rrf")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d20 in both rankings: 1/62 + 1/61; d10 and d30 in one each
    assert(got.toSeq == Seq(
      (1L, 1L, 20L, r6(1.0 / 62 + 1.0 / 61)),
      (1L, 2L, 10L, r6(1.0 / 61)),
      (1L, 3L, 30L, r6(1.0 / 62))))
    // weighted N-way: per-ranking weights scale each contribution —
    // hand-computed, down-weighting b demotes its exclusive d30 hard
    val gotW = CorpusOps.rrfFuseWeighted(Seq(a -> 0.9, b -> 0.1), "doc_id", k = 10)
      .select("fused_rank", "doc_id", "rrf")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(gotW.toSeq == Seq(
      (1L, 20L, r6(0.9 / 62 + 0.1 / 61)),
      (2L, 10L, r6(0.9 / 61)),
      (3L, 30L, r6(0.1 / 62))), s"weighted fusion unexpected: ${gotW.toSeq}")
  }

  test("rankingMetrics: hand-computed MRR/nDCG; zero-label queries report zeros") {
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), // q1: hit at rank 2
      (2L, 40L, 1L)) // q2: no labels at all
      .toDF("query_id", "doc_id", "rank")
    val labels = Seq(
      (1L, 20L, 2.0), // retrieved at rank 2
      (1L, 99L, 1.0)) // relevant but NOT retrieved — hurts ndcg via idcg
      .toDF("query_id", "doc_id", "rel")
    val got = CorpusOps.rankingMetrics(ranked, labels, "doc_id", k = 3)
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val log2_3 = math.log(3.0) / math.log(2.0)
    val dcg = 3.0 / log2_3 // (2^2-1)/log2(2+1)
    val idcg = 3.0 / 1.0 + 1.0 / log2_3 // ideal: rel2 at pos1, rel1 at pos2
    assert(got(1L) == ((0.5, r6(dcg), r6(idcg), r6(dcg / idcg))), s"got ${got(1L)}")
    assert(got(2L) == ((0.0, 0.0, 0.0, 0.0)), s"got ${got(2L)}")
  }

  test("bm25TopK gold exclusion removes the pair pre-cut and re-closes the ranking") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val probes = Seq((1L, "vector scan filter")).toDF("query_id", "query_text")
    val full = CorpusOps.bm25TopK(docs, "doc_id", "text", probes, k = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(full.length > 11, "fixture must rank more docs than the cut")
    // gold = the would-be TOP hit: the strongest displacement case
    val top = full.minBy(p => (-p._3, p._2))
    val gold = Seq((top._1, top._2)).toDF("query_id", "positive_id")
    val got = CorpusOps.bm25TopK(docs, "doc_id", "text", probes, k = 10,
        positives = Some(gold))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(!got.exists(p => p._3 == top._2), "the gold doc surfaced as a negative")
    val expected = full.filterNot(p => p._2 == top._2)
      .sortBy(p => (-p._3, p._2)).take(10).zipWithIndex
      .map { case (p, i) => (p._1, i + 1L, p._2, p._3) }.toSet
    assert(got.toSet == expected, "gold-excluded ranking is not the filtered re-rank")
  }
}
