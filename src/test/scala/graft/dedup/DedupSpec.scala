package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup invariants beyond the oracle: planted-pair recall through the
  * LSH s-curve, sketch locality, and plan shape (bucket join, never
  * cartesian). */
class DedupSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    .select("doc_id", "text")

  private lazy val planted = docs.unionAll(
    docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" xtra")).as("text")))

  test("MinHash-LSH recall: all 50 planted near-dup pairs survive band+verify") {
    val pairs = Dedup.nearDupPairs(planted, "doc_id", "text", threshold = 0.6)
    val found = pairs.filter(col("id_b") === col("id_a") + 100000).count()
    assert(found == 50, s"only $found/50 planted pairs found")
  }

  test("LSH candidate generation joins on (band, band_hash) — no cartesian") {
    val plan = Dedup.nearDupPairs(planted, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in LSH plan:\n$plan")
  }

  test("exact dedup keeps one keeper per distinct text; idempotent") {
    val corpus = docs.unionAll(docs.select(col("doc_id") + 7777, col("text")))
    val survivors = Dedup.exactDedup(corpus, "doc_id", "text")
    assert(survivors.count() == docs.count())
    assert(survivors.agg(max("n_copies")).head().getLong(0) == 2)
    // keeper is always the original (minimum) id
    assert(survivors.filter(col("keeper") >= 7777).count() == 0)
  }

  test("simhash: deterministic, 32 bits, and a one-token edit flips few bits") {
    val sk = Dedup.simhashAgg(planted, "doc_id", "text").withColumnRenamed("simhash", "h")
    // the codegen'd aggregate form must equal the HOF column expression
    val viaExpr = planted.limit(20).select(col("doc_id"), Dedup.simhash("text").as("h"))
    val agree = viaExpr.join(sk.withColumnRenamed("h", "h2"), "doc_id")
      .filter(col("h") =!= col("h2")).count()
    assert(agree == 0, "simhashAgg diverges from the simhash expression")
    assert(sk.filter(length(col("h")) =!= 32).count() == 0)
    val ham = sk.as("a")
      .join(sk.as("b"), col("b.doc_id") === col("a.doc_id") + 100000)
      .select(Dedup.hamming(col("a.h"), col("b.h")).as("d"))
    assert(ham.agg(max("d")).head().getLong(0) <= 10,
      "one-token edit should flip few sketch bits")
    // unrelated docs are mostly far apart: median pairwise distance is large
    val far = sk.filter(col("doc_id") < 20)
    val dists = far.as("a").join(far.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(Dedup.hamming(col("a.h"), col("b.h")).as("d"))
    assert(dists.agg(expr("percentile(d, 0.5)")).head().getDouble(0) >= 6.0)
  }

  test("connected components: chains merge, labels are min-reachable id, isolated pairs stay apart") {
    import spark.implicits._
    // 1~2~3 chain (no direct 1-3 edge), isolated 10~11, and 20~21~22 star
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("partitionsHint bypasses the partition probe and gates the repartition") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c d e"), (3L, "x y z w")).toDF("doc_id", "text")
    def hasRepartition(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
      }.nonEmpty
    // hinted as already well-partitioned → the full-corpus shuffle must
    // NOT appear in the plan (the round-3 scale-killer this gate fixed)
    val wellPartitioned = Dedup.nearDupPairs(docs, "doc_id", "text",
      partitionsHint = Some(10000))
    assert(!hasRepartition(wellPartitioned),
      "hinted-wide input still planned the full-corpus repartition")
    // hinted below any possible parallelism → the spread kicks in
    // (Some(0), not Some(1): on a 1-core runner defaultParallelism is 1
    // and `1 < 1` would correctly skip the spread, failing the test for
    // an environment reason)
    val narrow = Dedup.nearDupPairs(docs, "doc_id", "text", partitionsHint = Some(0))
    assert(hasRepartition(narrow), "underpartitioned input lost its CPU-spread repartition")
    // results identical either way
    assert(wellPartitioned.collect().toSet == narrow.collect().toSet)
  }

  test("substringSpanPairs: aligned shared spans are found; short docs and boilerplate are not") {
    import spark.implicits._
    // doc 1: 300 distinct chars; doc 2 embeds doc 1's chars 101..300
    // at the SAME stride alignment behind 100 junk chars — the two
    // share exactly the windows fully inside the common span: offsets
    // 100 and 150 of a 200-char span with window=100, stride=50 → 3
    // aligned windows ([100,200) [150,250) [200,300))
    val base = (0 until 300).map(i => ('a' + i % 26).toChar).mkString
    val shared = base.substring(100)
    val recs = Seq(
      (1L, base),
      (2L, "!" * 100 + shared),
      (3L, "too short"),                  // < window → zero fingerprints
      (4L, base.reverse)                  // same chars, different content
    ).toDF("doc_id", "text")
    val pairs = Dedup.substringSpanPairs(recs, "doc_id", "text", window = 100, stride = 50)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 3L)), s"got $pairs")
  }

  test("substringSpanPairs: the boilerplate guard drops fingerprints shared corpus-wide") {
    import spark.implicits._
    val boiler = "b" * 100
    // 80 docs all carrying the identical text: every fingerprint is in
    // an 80-doc bucket (> 64) → dropped, zero pairs; plus one rare
    // 2-doc span that must survive
    val rare = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    val recs = ((1L to 80L).map(i => (i, boiler)) ++ Seq((100L, rare), (101L, rare)))
      .toDF("doc_id", "text")
    val pairs = Dedup.substringSpanPairs(recs, "doc_id", "text", window = 100, stride = 50)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L, 1L)),
      s"boilerplate leaked or the rare pair was lost: ${pairs.take(5)}")
  }

  test("containmentPairs finds the excerpt Jaccard misses; direction and df-cap hold") {
    import spark.implicits._
    // a 200-word article and a 12-word excerpt of it: Jaccard ≈ 5%
    // (far under any near-dup threshold), containment = 1.0
    val words = (0 until 200).map(i => s"w$i")
    val article = words.mkString(" ")
    val excerpt = words.slice(40, 52).mkString(" ")
    val unrelated = (0 until 50).map(i => s"z$i").mkString(" ")
    val recs = Seq((1L, article), (2L, excerpt), (3L, unrelated))
      .toDF("doc_id", "text")
    val jac = recs.as("a").join(recs.as("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(Dedup.jaccard(
        Dedup.wordShingles(col("a.text"), 3),
        Dedup.wordShingles(col("b.text"), 3)))
      .head().getDouble(0)
    assert(jac < 0.1, s"excerpt should be invisible to Jaccard, got $jac")
    val pairs = Dedup.containmentPairs(recs, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((2L, 1L, 1.0)),
      s"excerpt must be contained in the article: ${pairs.mkString(",")}")
    // df-cap: a shingle in >maxDf docs indexes nothing, but still
    // counts in the denominator — all-boilerplate docs can't pair
    val boiler = (1L to 70L).map(i => (i, "same three words exactly"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(boiler, "doc_id", "text", n = 3).isEmpty)
  }

  test("editBlockedPairs: deletion-neighborhood blocking finds exactly the dist ≤ 1 pairs") {
    import spark.implicits._
    val recs = Seq(
      (1L, "martin", 0L), (2L, "martn", 0L),   // deletion        → dist 1
      (3L, "marvin", 0L),                       // substitution vs martin → dist 1
      (4L, "martini", 0L),                      // insertion vs martin    → dist 1
      (5L, "martin", 1L),                       // same name, OTHER block → no pair
      (6L, "zeta", 0L)                          // far from everything
    ).toDF("id", "name", "blk")
    val pairs = Dedup.editBlockedPairs(recs, "id", "name", "blk")
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    // brute-force truth within the block: every pair of {1,2,3,4,6} at dist ≤ 1
    assert(pairs == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)),
      s"got $pairs")
  }

  test("editBlockedPairs: identical records pair at dist 0; empty names don't explode") {
    import spark.implicits._
    val recs = Seq((1L, "anna", 0L), (2L, "anna", 0L), (3L, "", 0L), (4L, "", 0L))
      .toDF("id", "name", "blk")
    val pairs = Dedup.editBlockedPairs(recs, "id", "name", "blk")
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    // the two empty names share their self-key and are dist 0; "a" vs ""
    // is dist 1 but "anna"/"" never share a key (dist 4 — correctly absent)
    assert(pairs == Set((1L, 2L, 0L), (3L, 4L, 0L)), s"got $pairs")
  }

  test("editBlockedPairs: the oversize-block guard drops non-discriminative keys") {
    import spark.implicits._
    // 80 records with the SAME name in one block: every key is shared by
    // all 80 (> maxBlockSize=64), so the guard must drop the whole block
    // — 80² pairwise work is exactly what it exists to prevent
    val degenerate = (1L to 80L).map(i => (i, "template-name", 0L))
    // plus a pair on a rare name that must SURVIVE the guard
    val recs = (degenerate ++ Seq((100L, "unique", 0L), (101L, "uniqu", 0L)))
      .toDF("id", "name", "blk")
    val pairs = Dedup.editBlockedPairs(recs, "id", "name", "blk", maxBlockSize = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)),
      s"oversized block leaked pairs (or the rare pair was lost): ${pairs.take(5)}")
    // raising the cap readmits the degenerate block — the guard, not the
    // keys, was what dropped it
    val uncapped = Dedup.editBlockedPairs(recs, "id", "name", "blk", maxBlockSize = 1000)
    assert(uncapped.count() == 80L * 79 / 2 + 1)
  }

  test("jaccard: identical sets → 1.0, disjoint → 0.0, order-insensitive") {
    import spark.implicits._
    val df = Seq(
      (Seq("a b", "b c"), Seq("b c", "a b")),
      (Seq("a b"), Seq("x y"))).toDF("s1", "s2")
    val r = df.select(Dedup.jaccard(col("s1"), col("s2")).as("j")).collect().map(_.getDouble(0))
    assert(r(0) == 1.0 && r(1) == 0.0)
  }

  test("LSH recall report: the banding S-curve is measured, monotone, and lossy below design") {
    import spark.implicits._
    // a synthetic corpus with a CONTROLLED Jaccard gradient: base docs
    // plus truncations at 40/60/80% of their words (orig↔trunc_p ≈ p)
    val words = (0 until 40).map(i => s"w$i")
    val base = (0 until 30).map { d =>
      (d.toLong, words.map(w => s"$w-$d").mkString(" "))
    }
    def trunc(p: Double, off: Long) = base.map { case (id, t) =>
      val ws = t.split(" ")
      (off + id, ws.take(math.max(2, (ws.length * p).toInt)).mkString(" "))
    }
    val corpus = (base ++ trunc(0.4, 1000) ++ trunc(0.6, 2000) ++
      trunc(0.8, 3000) ++ trunc(1.0, 4000) /* identical copies: j=1 */)
      .toDF("doc_id", "text")
    val report = Dedup
      .lshRecallReport(corpus, "doc_id", "text", Seq(0.5, 0.7, 0.9))
      .collect().map(r => r.getDouble(0) ->
        ((r.getAs[Long]("n_true"), r.getAs[Double]("recall")))).toMap
    // the gradient planted true pairs at every threshold
    assert(report.values.forall(_._1 > 0), s"degenerate corpus: $report")
    // recall is monotone in the threshold (the S-curve), and the
    // config IS lossy below its design point — the fact the report
    // exists to surface
    assert(report(0.5)._2 <= report(0.7)._2 && report(0.7)._2 <= report(0.9)._2,
      s"S-curve not monotone: $report")
    assert(report(0.5)._2 < 1.0,
      s"expected measurable loss at j>=0.5 with 4 bands: $report")
    assert(report(0.9)._2 == 1.0,
      s"high-jaccard pairs must all surface: $report")
  }
}
