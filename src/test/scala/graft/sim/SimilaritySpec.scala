package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity-search invariants the oracle can't express: approximate
  * recall vs the exact baseline, and plan shape (the scale paths must
  * never plan a cartesian product over the corpus). */
class SimilaritySpec extends SparkSpec {

  private lazy val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
  private lazy val queries = e.filter(col("vec_id") < 10)

  test("sourceDrift: identical members sit exactly at their centroid (cos 1)") {
    import spark.implicits._
    // src A: three copies of one vector → centroid == the vector;
    // src B: two orthogonal vectors → centroid halfway, cos < 1
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)),
      (4L, Array(1.0f, 0.0f)), (5L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val docsDf = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B")
    ).toDF("doc_id", "source")
    val out = Similarity.sourceDrift(docsDf, emb)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("A") == ((3L, 1.0, 1.0)), s"identical members must score cos 1: ${out("A")}")
    // B's centroid is (0.5, 0.5); each member's cosine to it = 1/sqrt(2)
    assert(out("B")._1 == 2L)
    assert(math.abs(out("B")._2 - 0.7071) < 1e-9 && math.abs(out("B")._3 - 0.7071) < 1e-9)
  }

  test("standardizeDims: hand-computed z-scores; constant dims map to 0") {
    import spark.implicits._
    // dim 0: values 1,3 → mu 2, var 1 → z = ∓1; dim 1: constant → 0
    val emb2 = Seq(
      (1L, Array(1.0f, 7.0f)), (2L, Array(3.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.standardizeDims(emb2, "vec_id", "embedding")
      .as[(Long, Int, Double)].collect().toSet
    assert(out == Set((1L, 0, -1.0), (2L, 0, 1.0), (1L, 1, 0.0), (2L, 1, 0.0)),
      s"got $out")
  }

  test("brute-force top-k: self is rank 1 with score ~1.0; k rows per query") {
    val r = Similarity.bruteForceTopK(queries, e, k = 10).cache()
    assert(r.count() == 100)
    val self = r.filter(col("rank") === 1).collect()
    assert(self.forall(row => row.getAs[Long]("query_id") == row.getAs[Long]("vec_id")))
    assert(self.forall(row => math.abs(row.getAs[Double]("score") - 1.0) < 1e-12))
  }

  test("PQ top-k: codebook self-reconstruction, L2 recall floor, m-code shape") {
    import org.apache.spark.sql.expressions.Window
    val r = Similarity.pqTopK(queries, e, k = 10, m = 4, numCodes = 16).cache()
    assert(r.count() == 100)
    // queries 0..9 are codebook entries (first 16 by id), so each
    // reconstructs EXACTLY: rank 1 = self at ADC distance 0.0 — a
    // wrong slice bound or code pick breaks the exact zero
    val self = r.filter(col("rank") === 1).collect()
    assert(self.forall(row => row.getAs[Long]("query_id") == row.getAs[Long]("vec_id")))
    assert(self.forall(row => row.getAs[Double]("score") == 0.0))
    // recall vs the EXACT L2 baseline (PQ approximates L2, not cosine):
    // approximate-by-design, but broken ≠ lossy
    val qd = queries.select(col("vec_id").as("query_id"),
      Similarity.asDouble(col("embedding")).as("qe"))
    val cd = e.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("ce"))
    val d2 = aggregate(zip_with(col("qe"), col("ce"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy("query_id").orderBy(col("score").asc, col("vec_id"))
    val exact = broadcast(qd).crossJoin(cd)
      .select(col("query_id"), col("vec_id"), d2.as("score"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select("query_id", "vec_id")
    val hit = exact.intersect(r.select("query_id", "vec_id")).count()
    val recall = hit.toDouble / exact.count()
    assert(recall >= 0.2, s"PQ recall@10 = $recall — encoding is broken, not just lossy")
    // compression shape: m ints per vector, every code < numCodes
    val codes = e.select(graft.functions.GraftFunctions.pqEncode(
      Similarity.asDouble(col("embedding")),
      Similarity.pqCodebook(e, 16), 4).as("codes"))
    val head = codes.limit(5).collect().map(_.getSeq[Int](0))
    assert(head.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 16)))
  }

  test("IVF-PQ refine: exact re-rank beats-or-ties plain IVF-PQ recall at equal budget") {
    // exact-COSINE baseline — the metric the refine stage optimizes;
    // against it the ≥-recall claim is BY CONSTRUCTION (any baseline
    // member displaced from the refined top-k is displaced only by
    // higher-cosine shortlist members, which are baseline members
    // themselves), so the assertion is a hard invariant, not a
    // statistical hope
    val exact = Similarity.bruteForceTopK(queries, e, k = 10)
      .select("query_id", "vec_id").cache()
    def recallOf(r: org.apache.spark.sql.DataFrame): Double =
      exact.intersect(r.select("query_id", "vec_id")).count().toDouble /
        exact.count()
    val plain = Similarity.ivfPqTopK(queries, e, k = 10,
      numCentroids = 10, nProbe = 3, m = 4, numCodes = 16)
    val refined = Similarity.ivfPqRefineTopK(queries, e, k = 10,
      numCentroids = 10, nProbe = 3, m = 4, numCodes = 16, refineFactor = 3)
    assert(refined.count() == 100)
    // codebook-member queries (0..9): self survives the ADC shortlist
    // (reconstructs exactly → distance 0) and the exact re-rank puts
    // it at rank 1 with cosine ~1.0
    val self = refined.filter(col("query_id") === col("vec_id")).collect()
    assert(self.length == 10)
    assert(self.forall(row => row.getAs[Long]("rank") == 1L &&
      math.abs(row.getAs[Double]("score") - 1.0) < 1e-12))
    // the point of the stage: recall never drops vs plain IVF-PQ at
    // the same probe budget (the refined top-k is chosen by exact
    // scores from a superset of the plain top-k's candidates)
    val (rPlain, rRef) = (recallOf(plain), recallOf(refined))
    assert(rRef >= rPlain,
      s"refine LOWERED recall: plain=$rPlain refined=$rRef")
    intercept[IllegalArgumentException] {
      Similarity.ivfPqRefineTopK(queries, e, 10, 10, 3, 4, 16, refineFactor = 0)
    }
  }

  test("cluster-stratified sample: per-cluster budget, centrality order, full coverage") {
    import spark.implicits._
    // unpersisted in the finally: this is the SAME logical plan the
    // declared corpus_diversity_sample builds, and a lingering cache
    // entry would swap the audit suite's executedPlan for an
    // InMemoryTableScan (hiding the window exchange it inspects)
    val sampled = Similarity.clusterStratifiedSample(e, numCentroids = 10,
      perCluster = 5).cache()
    try {
    val byCluster = sampled.groupBy("cid").count()
      .as[(Long, Long)].collect().toMap
    // budget respected per cluster; every non-empty cluster represented
    assert(byCluster.values.forall(_ <= 5), s"over budget: $byCluster")
    assert(byCluster.keySet == (0L until 10L).toSet,
      s"a cluster lost representation: ${byCluster.keySet}")
    // ranks contiguous from 1 and ordered by centrality (score desc)
    val ranks = sampled.select("cid", "rank", "score")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    ranks.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq.reverse.sorted.reverse ==
        sorted.map(_._3).toSeq, "rank order disagrees with centrality")
    }
    // a centroid-seed vector is its own cluster's most central member
    val selfRank = sampled.filter(col("vec_id") === col("cid"))
      .select("rank").as[Long].collect()
    assert(selfRank.forall(_ == 1L),
      "a centroid vector is not rank 1 in its own cluster")
    intercept[IllegalArgumentException](
      Similarity.clusterStratifiedSample(e, 10, perCluster = 0))
    } finally { sampled.unpersist(blocking = false); () }
  }

  test("PQ kernels refuse indivisible dimensions and ragged codebooks loudly") {
    // the SQL-registered kernels are reachable without pqTopK's API
    // validation — integer division would silently drop the trailing
    // dim % m elements of every vector (wrong codes, no signal)
    val bad = intercept[Exception] {
      spark.sql(
        "SELECT graft_pq_encode(array(1.0d, 2.0d, 3.0d), " +
          "array(array(1.0d, 2.0d, 3.0d)), 2)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(bad).exists(_.contains("not divisible")), s"got $bad")
    val badAdc = intercept[Exception] {
      spark.sql(
        "SELECT graft_pq_adc(array(1.0d, 2.0d, 3.0d), array(0, 0), " +
          "array(array(1.0d, 2.0d, 3.0d)), 2)").collect()
    }
    assert(msgs(badAdc).exists(_.contains("not divisible")), s"got $badAdc")
    // a codebook entry shorter than the vector would read past its end
    val ragged = intercept[Exception] {
      spark.sql(
        "SELECT graft_pq_encode(array(1.0d, 2.0d, 3.0d, 4.0d), " +
          "array(array(1.0d, 2.0d)), 2)").collect()
    }
    assert(msgs(ragged).exists(_.contains("codebook entry")), s"got $ragged")
    // the happy path still encodes
    val ok = spark.sql(
      "SELECT graft_pq_encode(array(1.0d, 2.0d, 3.0d, 4.0d), " +
        "array(array(1.0d, 2.0d, 3.0d, 4.0d)), 2)").collect()
    assert(ok.head.getSeq[Int](0) == Seq(0, 0))
  }

  test("IVF-PQ: self lands rank 1 at ADC 0 (own cell always probed)") {
    val r = Similarity.ivfPqTopK(queries, e, k = 10,
      numCentroids = 10, nProbe = 3, m = 4, numCodes = 16).cache()
    // a query's own cell is its top cosine probe (same argmin, same
    // tie-break as the assignment), and queries 0..9 are codebook
    // members, so each reconstructs exactly: rank 1 = self at 0.0
    val self = r.filter(col("query_id") === col("vec_id")).collect()
    assert(self.length == 10, s"missing self-hits: ${self.length}/10")
    assert(self.forall(row => row.getAs[Long]("rank") == 1L &&
      row.getAs[Double]("score") == 0.0))
    // cell pruning really prunes: strictly fewer scored candidates than
    // |Q| × N (every query sees at most its 3 probed cells)
    assert(r.count() == 100)
  }

  test("LSH top-k recall@10 vs brute force is usable (approximate scale path)") {
    val exact = Similarity.bruteForceTopK(queries, e, k = 10)
      .select("query_id", "vec_id")
    val approx = Similarity.lshTopK(queries, e, k = 10)
      .select("query_id", "vec_id")
    val hit = exact.intersect(approx).count()
    val recall = hit.toDouble / exact.count()
    assert(recall >= 0.3, s"recall@10 = $recall — LSH bucketing is broken, not just lossy")
    // self-match always shares every bucket with itself
    assert(approx.filter(col("query_id") === col("vec_id")).count() == queries.count())
  }

  test("lshBuckets kernel ≡ per-plane HOF lshBucket reference form") {
    graft.functions.GraftFunctions.register(spark)
    val e64 = Similarity.asDouble(col("embedding"))
    val composed = array((0 until 8).map(t =>
      Similarity.lshBucket(e64, t, 5, 64)): _*)
    val diff = e.limit(100).select(
      graft.functions.GraftFunctions.lshBuckets(col("embedding"), 8, 5, 64).as("k"),
      composed.as("c"))
      .filter(col("k") =!= col("c"))
    assert(diff.count() == 0)
  }

  test("lshTopKLarge ≡ lshTopK: the batch rerank changes join strategy, never results") {
    val broadcastForm = Similarity.lshTopK(queries, e, k = 10)
      .select("query_id", "rank", "vec_id")
    val shuffleForm = Similarity.lshTopKLarge(queries, e, k = 10)
      .select("query_id", "rank", "vec_id")
    assert(broadcastForm.exceptAll(shuffleForm).count() == 0 &&
           shuffleForm.exceptAll(broadcastForm).count() == 0,
      "batch rerank diverged from the broadcast form on identical input")
  }

  test("LSH candidate join is a hash join on (table, bucket), not cartesian") {
    val plan = Similarity.lshTopK(queries, e, k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in LSH plan:\n$plan")
  }

  test("IVF top-k: per-query rows bounded by k; probing fewer cells shrinks candidates") {
    val r3 = Similarity.ivfTopK(queries, e, k = 10, numCentroids = 10, nProbe = 3)
    val r1 = Similarity.ivfTopK(queries, e, k = 10, numCentroids = 10, nProbe = 1)
    val n3 = r3.groupBy("query_id").count().agg(max("count")).head().getLong(0)
    assert(n3 <= 10)
    assert(r1.count() <= r3.count(), "nProbe=1 must not see more candidates than nProbe=3")
  }

  test("IVF insert path: append-then-probe ≡ rebuild-then-probe, file-level append only") {
    val cents = Similarity.initialCentroids(e, 10)
    val full = java.nio.file.Files.createTempDirectory("ivf_full").toString
    val grown = java.nio.file.Files.createTempDirectory("ivf_grown").toString
    Similarity.writeIvfIndex(e, full, cents)
    Similarity.writeIvfIndex(e.filter(col("vec_id") % 2 === 0), grown, cents)
    val bootFiles = spark.read.parquet(grown)
      .select(col("_metadata.file_path")).distinct().count()
    Similarity.appendToIvfIndex(e.filter(col("vec_id") % 2 =!= 0), grown, cents)
    // strictly additive: every bootstrap file survives the append
    val grownFiles = spark.read.parquet(grown)
      .select(col("_metadata.file_path")).distinct().count()
    assert(grownFiles > bootFiles, "append produced no new files")
    val a = Similarity.ivfTopKFromIndex(spark, full, queries, 10, cents, nProbe = 3)
    val b = Similarity.ivfTopKFromIndex(spark, grown, queries, 10, cents, nProbe = 3)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "insert path diverged from a full rebuild under fixed centroids")
  }

  test("IVF recall@10 vs brute force (nProbe=3 of 10 cells)") {
    val exact = Similarity.bruteForceTopK(queries, e, k = 10).select("query_id", "vec_id")
    val ivf = Similarity.ivfTopK(queries, e, k = 10).select("query_id", "vec_id")
    val recall = exact.intersect(ivf).count().toDouble / exact.count()
    assert(recall >= 0.3, s"IVF recall@10 = $recall")
  }

  test("IVF trained centroids (Lloyd's): k preserved, centroids move, recall holds") {
    val cents0 = Similarity.initialCentroids(e, 10)
    val cents2 = Similarity.trainCentroids(e, 10, iters = 2)
    assert(cents2.size == 10)
    assert(cents2.map(_._1) == cents0.map(_._1), "cell ids must be stable across training")
    assert(cents2.exists { case (cid, v) => v != cents0.find(_._1 == cid).get._2 },
      "training never moved any centroid")
    val exact = Similarity.bruteForceTopK(queries, e, k = 10).select("query_id", "vec_id")
    val trained = Similarity.ivfTopK(queries, e, k = 10, numCentroids = 10,
      nProbe = 3, trainIters = 2).select("query_id", "vec_id")
    val recall = exact.intersect(trained).count().toDouble / exact.count()
    assert(recall >= 0.3, s"trained IVF recall@10 = $recall")
  }

  test("IVF training earns its keep: trained centroids beat the first-k seed on clustered data") {
    import spark.implicits._
    // The fixture embeddings are near-uniform, where any centroid set
    // performs alike — this corpus is CLUSTERED (10 gaussian blobs) and
    // id-ordered so the first-k seed is adversarial: ids 0..49 all sit
    // in blob 0, so all 10 seed centroids land in ONE blob and probing
    // 2 of 10 cells misses most true neighbors. Lloyd's iterations must
    // spread the centroids and lift recall at the SAME probe budget.
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 500).map { i =>
      val c = centers(i / 50)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queriesC = corpus.filter(col("vec_id") % 50 === 25) // one per blob
    val exact = Similarity.bruteForceTopK(queriesC, corpus, k = 10)
      .select("query_id", "vec_id")
    def recall(cents: Similarity.Centroids): Double =
      Similarity.ivfTopKWith(queriesC, corpus, k = 10, cents, nProbe = 2)
        .select("query_id", "vec_id")
        .intersect(exact).count().toDouble / exact.count()
    val seedRecall = recall(Similarity.initialCentroids(corpus, 10))
    val trainedRecall = recall(Similarity.trainCentroids(corpus, 10, iters = 5))
    assert(trainedRecall > seedRecall,
      s"training did not improve recall: seed=$seedRecall trained=$trainedRecall")
    assert(trainedRecall >= 0.5,
      s"trained recall unusably low on clustered data: $trainedRecall (seed=$seedRecall)")
  }

  test("IVF at-rest index: probing is partition pruning; results match the in-memory path") {
    val cents = Similarity.initialCentroids(e, 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    Similarity.writeIvfIndex(e, dir, cents)
    val fromIdx = Similarity.ivfTopKFromIndex(spark, dir, queries, k = 10, cents, nProbe = 3)
    val inMem = Similarity.ivfTopKWith(queries, e, k = 10, cents, nProbe = 3)
    assert(fromIdx.exceptAll(inMem).count() == 0 && inMem.exceptAll(fromIdx).count() == 0,
      "index path diverges from in-memory IVF")
    // the probed cells must reach the scan as a PARTITION filter — the
    // whole point of the at-rest layout
    fromIdx.collect()
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"probe set did not become a partition filter:\n$plan")
  }

  test("residual IVF-PQ earns its keep: recall beats-or-ties raw coding on clustered data") {
    import spark.implicits._
    // Blobs INTERLEAVED with id (i % 10) so the first-k centroid seed
    // lands one per blob and cells track blobs; within a blob, each
    // vector's offset comes from a SHARED pattern set (i % 16) at
    // sub-blob scale + small noise — the structure real embeddings
    // have (residuals correlate across the corpus). Residual coding
    // spends its 16 codes on the patterns (near-exact), while raw
    // coding must spread them across whole blobs (coarse) — the FAISS
    // IndexIVFPQ argument, made measurable.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val patterns = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 500).map { i =>
      val c = centers(i % 10)
      val p = patterns(i % 16)
      (i.toLong, c.indices.map(d =>
        (c(d) + 0.5 * p(d) + 0.05 * rnd.nextGaussian()).toFloat).toArray)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queriesC = corpus.filter(col("vec_id") % 50 === 25)
    val exact = Similarity.bruteForceTopK(queriesC, corpus, k = 10)
      .select("query_id", "vec_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "vec_id")
        .intersect(exact).count().toDouble / exact.count()
    val raw = recall(Similarity.ivfPqTopK(queriesC, corpus, k = 10,
      numCentroids = 10, nProbe = 3, m = 4, numCodes = 16))
    val res = recall(Similarity.ivfPqResidualTopK(queriesC, corpus, k = 10,
      numCentroids = 10, nProbe = 3, m = 4, numCodes = 16))
    assert(res >= raw,
      s"residual coding must not lose recall at equal budget: res=$res raw=$raw")
    assert(res >= 0.5, s"residual recall unusably low on clustered data: $res")
    // the refine invariant holds on the residual shortlist too: exact
    // re-rank of a superset never loses recall
    val resRef = recall(Similarity.ivfPqResidualRefineTopK(queriesC, corpus,
      k = 10, numCentroids = 10, nProbe = 3, m = 4, numCodes = 16,
      refineFactor = 3))
    assert(resRef >= res,
      s"residual refine lost recall vs its own shortlist: ref=$resRef res=$res")
  }

  test("coded IVF-PQ at-rest index: probing is partition pruning; results match in-memory") {
    val cents = Similarity.initialCentroids(e, 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    val cb = Similarity.writeIvfPqIndex(e, dir, cents, m = 4, numCodes = 16)
    val fromIdx = Similarity.ivfPqTopKFromIndex(spark, dir, queries, k = 10,
      cents, cb, nProbe = 3, m = 4)
    val inMem = Similarity.ivfPqTopK(queries, e, k = 10,
      numCentroids = 10, nProbe = 3, m = 4, numCodes = 16)
    assert(fromIdx.exceptAll(inMem).count() == 0 && inMem.exceptAll(fromIdx).count() == 0,
      "coded index path diverges from in-memory IVF-PQ")
    fromIdx.collect()
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"probe set did not become a partition filter:\n$plan")
    // the INDEX scan reads m ints per row, never a raw embedding
    // column (the query side reads embeddings — that's the probe)
    val idxSchemas = "Location: InMemoryFileIndex[^\\n]*graft_ivfpq[^\\n]*ReadSchema: (\\S+)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(idxSchemas.nonEmpty, s"no coded-index scan in the plan:\n$plan")
    idxSchemas.foreach(sch => assert(!sch.contains("embedding"),
      s"coded index scan still reads raw embeddings: $sch"))
  }

  test("probed-cells literal bound refuses loud past MaxProbedCells") {
    // the bound trips on the centroid count alone — before any data or
    // index I/O, so an oversharded quantizer fails at plan time
    val tooMany: Similarity.Centroids =
      (0L to Similarity.MaxProbedCells.toLong).map(i => i -> Seq(1.0, 0.0))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFromIndex(spark, "/tmp/nonexistent_idx", queries,
        k = 5, tooMany, nProbe = 1)
    }
    assert(e1.getMessage.contains("ivfTopKLarge"),
      s"refusal must name the corpus-scale remedy: ${e1.getMessage}")
  }

  test("near-dup blocking finds planted exact copies and nothing below threshold") {
    val corpus = e.select("vec_id", "embedding")
      .unionAll(e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val pairs = Similarity.nearDupPairs(corpus, threshold = 0.999).cache()
    val planted = pairs.filter(col("id_b") === col("id_a") + 10000)
    assert(planted.count() == 20)
    assert(pairs.agg(min("cos")).head().getDouble(0) >= 0.999)
  }

  test("semanticDedup drops planted copies and registers nothing in the CacheManager") {
    val corpus = e.select("vec_id", "embedding")
      .unionAll(e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val cents = Similarity.initialCentroids(corpus, 8)
    val out = Similarity.semanticDedup(corpus, cents, threshold = 0.999)
    val survivors = out.select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    // a planted copy is bit-identical to its origin → same cell, cosine
    // 1.0 → the higher id (the copy) is dropped, every time
    assert((0L until 20L).forall(survivors.contains))
    assert(survivors.forall(_ < 10000))
    // the assignment materialization must be a localCheckpoint (an
    // ExistingRDD leaf the ContextCleaner collects with the frame),
    // NEVER a CacheManager-registered persist, which leaks storage per
    // invocation for the session's lifetime (round-4 advice)
    val optimized = out.queryExecution.optimizedPlan
    val cached = optimized.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cached.isEmpty, "semanticDedup planned through an InMemoryRelation (persist leak)")
    assert(optimized.collectLeaves().exists(_.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      "expected the checkpointed assignment as an ExistingRDD leaf")
  }

  test("hardNegatives excludes self and the near-dup band, ranks the rest by cosine") {
    // corpus = fixture + exact copies of the anchors: the copy scores
    // cosine 1.0 against its anchor — the single most-similar
    // candidate — and must be EXCLUDED by the dup filter (a near-dup
    // labeled negative is a false negative), not ranked first
    val corpus = e.select("vec_id", "embedding")
      .unionAll(e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val cents = Similarity.initialCentroids(corpus, 10)
    val negs = Similarity.hardNegatives(corpus.filter(col("vec_id") < 5),
      corpus, k = 10, cents, nProbe = 3, dupThreshold = 0.95).cache()
    val rows = negs.select("anchor_id", "negative_id", "score")
      .as[(Long, Long, Double)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble)).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, n, _) => n != a && n != a + 10000 },
      "self and the planted exact copy must never appear as negatives")
    assert(rows.forall(_._3 < 0.95), "every negative sits below the dup band")
    // ranking agrees with ivfTopKWith restricted to the same exclusions
    val ref = Similarity.ivfTopKWith(corpus.filter(col("vec_id") < 5),
      corpus, k = 20, cents, nProbe = 3)
      .filter(col("vec_id") =!= col("query_id") && col("score") < 0.95)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    val refTop = ref.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).collect().toSet
    assert(rows.map { case (a, n, _) => (a, n) }.toSet == refTop)
  }

  test("hardNegativesLarge matches hardNegatives row-for-row (shuffle-join sibling)") {
    val corpus = e.select("vec_id", "embedding")
      .unionAll(e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val cents = Similarity.initialCentroids(corpus, 10)
    val anchors = corpus.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val small = rows(Similarity.hardNegatives(anchors, corpus, k = 10,
      cents, nProbe = 3, dupThreshold = 0.95))
    val large = rows(Similarity.hardNegativesLarge(anchors, corpus, k = 10,
      cents, nProbe = 3, dupThreshold = 0.95))
    assert(small == large,
      s"broadcast and shuffle-join variants diverge: ${small.diff(large)} / ${large.diff(small)}")
  }

  test("known-positives exclusion removes gold pairs and re-closes the ranking") {
    val corpus = e.select("vec_id", "embedding")
      .unionAll(e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val cents = Similarity.initialCentroids(corpus, 10)
    val anchors = corpus.filter(col("vec_id") < 5)
    // the FULL candidate ranking (k beyond any candidate count), so the
    // expected gold-excluded result is derivable by plain filtering
    val full = Similarity.hardNegatives(anchors, corpus, k = 100000,
      cents, nProbe = 3, dupThreshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // gold = each anchor's would-be TOP negative: the strongest possible
    // displacement — if the anti-join ran after the rank cut, the gold
    // pair would burn slot 1 instead of freeing it (picked by score,
    // not collect order, which is not rank-contractual)
    val gold = full.groupBy(_._1)
      .map { case (_, g) => g.minBy(p => (-p._3, p._2)) }.toSeq
    val goldDf = spark.createDataFrame(gold.map(p => (p._1, p._2)))
      .toDF("anchor_id", "positive_id")
    val got = Similarity.hardNegatives(anchors, corpus, k = 10,
      cents, nProbe = 3, dupThreshold = 0.95, positives = Some(goldDf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val goldSet = gold.map(p => (p._1, p._2)).toSet
    assert(got.forall { case (a, _, n, _) => !goldSet.contains((a, n)) },
      "a gold positive surfaced as a negative")
    // expected = full ranking minus gold, ranks re-closed, top 10
    val expected = full.filterNot(p => goldSet.contains((p._1, p._2)))
      .groupBy(_._1).toSeq.flatMap { case (a, g) =>
        g.sortBy(p => (-p._3, p._2)).take(10).zipWithIndex
          .map { case (p, i) => (a, i + 1L, p._2, p._3) }
      }.toSet
    assert(got.toSet == expected, "gold-excluded ranking is not the filtered re-rank")
    // the large variant applies the identical exclusion
    val gotLarge = Similarity.hardNegativesLarge(anchors, corpus, k = 10,
      cents, nProbe = 3, dupThreshold = 0.95, positives = Some(goldDf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(gotLarge.toSet == expected)
  }

  test("marginBitextMine: planted translations mined as forward-best pairs; hubs normalized") {
    val src = e.filter(col("vec_id") < 40).select("vec_id", "embedding")
    val tgt = e.filter(col("vec_id") < 20 || col("vec_id") >= 40)
      .select((col("vec_id") + 30000).as("vec_id"), col("embedding"))
    val fwd = Similarity.ivfTopKWith(src, tgt, k = 4,
      Similarity.initialCentroids(tgt, 10), nProbe = 3)
    val bwd = Similarity.ivfTopKWith(tgt, src, k = 4,
      Similarity.initialCentroids(src, 10), nProbe = 3)
    val mined = Similarity.marginBitextMine(fwd, bwd, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // each planted translation (exact copy, cos 1.0) is its source's
    // forward-best pair, with a margin strictly above 1
    for (i <- 0L until 20L) {
      val (t, cos, m) = mined.getOrElse(i, fail(s"src $i mined nothing"))
      assert(t == i + 30000L, s"src $i mined $t, not its planted translation")
      assert(cos > 0.9999 && m > 1.0, s"src $i: cos=$cos margin=$m")
    }
    // at most one pair per source (forward-best), margins all ≥ cut
    assert(mined.values.forall(_._3 >= 1.0))
    // planted pairs out-margin every unplanted mined pair on average —
    // the hub normalization doing its job (raw cosine alone could not
    // separate an exact pair from a hub's inflated similarity)
    val planted = (0L until 20L).map(mined(_)._3)
    val rest = mined.filter { case (k, _) => k >= 20L }.values.map(_._3)
    assert(rest.isEmpty ||
      planted.sum / planted.size > rest.sum / rest.size,
      s"planted margins do not dominate: $planted vs $rest")
  }

  test("crossSetNearDup: planted benchmark copies always caught; block-breaking flip hidden (the documented miss)") {
    import spark.implicits._
    val dim = 32
    val base = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (if (j == i % dim) 4.0 else 0.25 + 0.01 * ((i * 7 + j) % 5)).toFloat).toSeq)
    }
    val corpus = base.toDF("vec_id", "embedding")
    // benchmark = 5 exact copies + 1 copy with coordinate 0's sign
    // flipped (cosine still ≈ 0.96 but it lands in a different block)
    val bench = (base.take(5).map { case (id, v) => (1000L + id, v) } :+
      ((1999L, base(6)._2.updated(0, -base(6)._2(0))))).toDF("vec_id", "embedding")
    val hits = Similarity.crossSetNearDup(corpus, bench, threshold = 0.9)
      .select("corpus_id", "ref_id").as[(Long, Long)].collect().toSet
    // identity plants: sign blocks are exact, all five caught
    assert((0L until 5L).forall(i => hits.contains((i, 1000L + i))), s"got $hits")
    // the flipped plant is HIDDEN by blocking — the approximation the
    // docstring declares and nearDupRecallReport measures
    assert(!hits.exists(_._2 == 1999L),
      "a block-breaking flip should not be catchable by sign blocks")
  }

  test("sign-block recall report: identical vectors always found, block-breaking flips measured lost") {
    import spark.implicits._
    // a controlled corpus: orthogonal-ish base vectors, exact copies
    // (must ALWAYS be candidates — sign blocks are exact for
    // identity), and a perturbation flipping coordinate 0's sign
    // (lands in the block → pair hidden, however high its cosine)
    val dim = 32
    val base = (0 until 24).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (if (j == i % dim) 4.0 else 0.25 + 0.01 * ((i * 7 + j) % 5)).toFloat).toSeq)
    }
    def flip0(off: Long) = base.map { case (id, v) =>
      (off + id, v.updated(0, -v(0)))
    }
    val corpus = (base ++ base.map { case (id, v) => (1000L + id, v) } ++
      flip0(2000)).toDF("vec_id", "embedding")
    val report = Similarity
      .nearDupRecallReport(corpus, thresholds = Seq(0.9, 0.999), blockDims = 16)
      .collect().map(r => r.getDouble(0) ->
        ((r.getAs[Long]("n_true"), r.getAs[Long]("n_found"),
          r.getAs[Double]("recall")))).toMap
    // at 0.999: the 24 identical-copy pairs are ALL found...
    assert(report(0.999)._1 >= 24 && report(0.999)._3 == 1.0,
      s"identity pairs lost: $report")
    // ...at 0.9: the flipped-coordinate pairs (cosine ≈ 0.96 — the
    // flipped coord carries a small energy fraction) are REAL true
    // pairs the block cannot see — measured loss, not theory
    assert(report(0.9)._1 > report(0.999)._1, s"no mid-cosine pairs planted: $report")
    assert(report(0.9)._3 < 1.0, s"expected block-breaking loss at 0.9: $report")
  }
}
