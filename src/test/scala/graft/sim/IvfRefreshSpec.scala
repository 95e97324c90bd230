package graft.sim

import graft.SparkSpec
import graft.store.CommitLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The drift-triggered index lifecycle's contract: bootstrap builds,
  * a healthy corpus is a no-op, a drifted corpus retrains AND the
  * retrained generation's recall on the drifted corpus is at least the
  * stale generation's, and the swap is atomic/time-travelable through
  * the registry's commit log. */
class IvfRefreshSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered corpus: 10 gaussian blobs in 64-dim, ids contiguous per
    * blob (the adversarial layout the clustered-recall harness uses).
    * `sourceOfBlob` controls drift: mapping each blob to its own source
    * gives tight sources (high member-to-centroid cosine); spreading
    * every source across all blobs scatters them (low cosine). */
  private def blobCorpus(seed: Int, centers: Array[Array[Double]]): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until 500).map { i =>
      val c = centers(i / 50)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def centers(seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
  }

  /** Docs table whose source assignment decides the drift reading. */
  private def docs(tight: Boolean): DataFrame =
    (0 until 500).map { i =>
      // tight: one source per blob (members hug their source centroid);
      // drifted: sources stripe ACROSS blobs, scattering each source
      val src = if (tight) s"s${i / 50}" else s"s${i % 5}"
      (i.toLong, src)
    }.toDF("doc_id", "source")

  private def freshPaths(): (String, String) = (
    Files.createTempDirectory("graft_ivf_reg").toString + "/registry",
    Files.createTempDirectory("graft_ivf_gens").toString)

  private def recallOn(corpus: DataFrame, cents: Similarity.Centroids): Double = {
    val queries = corpus.filter(col("vec_id") % 50 === 25) // one per blob
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 10)
      .select("query_id", "vec_id")
    Similarity.ivfTopKWith(queries, corpus, k = 10, cents, nProbe = 2)
      .select("query_id", "vec_id")
      .intersect(exact).count().toDouble / exact.count()
  }

  test("bootstrap builds gen 1; a healthy corpus is a no-op; reads hit the pruned index") {
    val (reg, root) = freshPaths()
    val corpus = blobCorpus(seed = 7, centers(1))
    val tightDocs = docs(tight = true)

    assert(IvfRefresh.currentGeneration(spark, reg).isEmpty)
    val boot = IvfRefresh.refreshIndexIfDrifted(tightDocs, corpus, reg, root,
      minCosThreshold = 0.5, trainIters = 2)
    assert(boot.refreshed && boot.gen.generation == 1L, boot.reason)
    assert(boot.gen.centroids.size == 10)

    // registry round trip is exact: the centroids read back from the
    // log are bit-identical to the ones trained
    val readBack = IvfRefresh.currentGeneration(spark, reg).get
    assert(readBack.centroids == boot.gen.centroids)
    assert(readBack.indexPath == boot.gen.indexPath)

    // tight sources sit well above the threshold → no second build
    assert(boot.gen.minSourceCos > 0.5,
      s"tight fixture should read healthy: ${boot.gen.minSourceCos}")
    val again = IvfRefresh.refreshIndexIfDrifted(tightDocs, corpus, reg, root,
      minCosThreshold = 0.5, trainIters = 2)
    assert(!again.refreshed && again.gen.generation == 1L, again.reason)

    // searching through the registry equals searching the generation's
    // index directly
    val queries = corpus.filter(col("vec_id") % 50 === 25)
    val viaRegistry = IvfRefresh.topK(spark, reg, queries, k = 10, nProbe = 2)
    val direct = Similarity.ivfTopKWith(queries, corpus, k = 10, boot.gen.centroids, nProbe = 2)
    assert(viaRegistry.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaRegistry).count() == 0)
  }

  test("drifted corpus triggers retrain; refreshed recall >= stale recall; swap is time-travelable") {
    val (reg, root) = freshPaths()

    // gen 1 trains on corpus A (blob family 1)
    val corpusA = blobCorpus(seed = 7, centers(1))
    val boot = IvfRefresh.refreshIndexIfDrifted(docs(tight = true), corpusA, reg, root,
      minCosThreshold = 0.5, trainIters = 5)
    assert(boot.refreshed && boot.gen.generation == 1L)

    // the corpus is replaced by corpus B — different blob family, and
    // sources striped across blobs so the monitor reads scattered
    val corpusB = blobCorpus(seed = 8, centers(2))
    val driftReading = IvfRefresh.minSourceCos(docs(tight = false), corpusB)
    assert(driftReading < 0.5, s"drifted fixture should read scattered: $driftReading")

    val staleRecall = recallOn(corpusB, boot.gen.centroids)

    val refreshed = IvfRefresh.refreshIndexIfDrifted(docs(tight = false), corpusB, reg, root,
      minCosThreshold = 0.5, trainIters = 5)
    assert(refreshed.refreshed && refreshed.gen.generation == 2L, refreshed.reason)

    val freshRecall = recallOn(corpusB, refreshed.gen.centroids)
    assert(freshRecall >= staleRecall,
      s"refresh lost recall on the drifted corpus: stale=$staleRecall fresh=$freshRecall")
    assert(freshRecall >= 0.5,
      s"refreshed recall unusably low: $freshRecall (stale=$staleRecall)")

    // the swap went through ONE registry commit: version 1 of the log
    // still serves gen 1 (old readers see a consistent index), the
    // head serves gen 2, and both index directories exist until vacuum
    val gen1 = IvfRefresh.currentGeneration(spark, reg, asOf = 1L).get
    assert(gen1.generation == 1L && gen1.centroids == boot.gen.centroids)
    assert(IvfRefresh.currentGeneration(spark, reg).get.generation == 2L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(boot.gen.indexPath)))
    assert(fs.exists(new org.apache.hadoop.fs.Path(refreshed.gen.indexPath)))
  }

  test("generation vacuum keeps the newest, reclaims superseded gens and crashed orphans") {
    val (reg, root) = freshPaths()
    val corpusA = blobCorpus(seed = 7, centers(1))
    IvfRefresh.refreshIndexIfDrifted(docs(tight = true), corpusA, reg, root,
      minCosThreshold = 0.5, trainIters = 1)                      // gen 1
    val corpusB = blobCorpus(seed = 8, centers(2))
    val g2 = IvfRefresh.refreshIndexIfDrifted(docs(tight = false), corpusB, reg, root,
      minCosThreshold = 0.5, trainIters = 1)                      // gen 2
    assert(g2.gen.generation == 2L)
    // a crashed refresh's orphan: landed a directory, never published
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "gen-99"))

    // age-gated: a fresh orphan survives a retention window
    assert(IvfRefresh.vacuumGenerations(spark, reg, root,
      keepLatest = 1, minAgeMs = 3600 * 1000).isEmpty)
    // test-mode age 0: gen-1 (superseded) and gen-99 (orphan) go, gen-2 stays
    val swept = IvfRefresh.vacuumGenerations(spark, reg, root, keepLatest = 1).toSet
    assert(swept == Set("gen-1", "gen-99"), s"swept $swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "gen-2")))
    // the live generation still serves
    val q = corpusB.filter(col("vec_id") % 50 === 25)
    assert(IvfRefresh.topK(spark, reg, q, k = 10, nProbe = 2).count() > 0)
    intercept[IllegalArgumentException] {
      IvfRefresh.vacuumGenerations(spark, reg, root, keepLatest = 0)
    }
  }

  test("a corpus the monitor cannot read (all-zero vectors) counts as drifted, not healthy") {
    val zero = (0 until 20).map(i => (i.toLong, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val d = (0 until 20).map(i => (i.toLong, "s0")).toDF("doc_id", "source")
    assert(IvfRefresh.minSourceCos(d, zero) == Double.NegativeInfinity)
  }

  test("CDC drain maintains the logged index: crash-resume exactly-once, deletes retract") {
    val cs = centers(11)
    val corpus = blobCorpus(12, cs)
    val cents = Similarity.initialCentroids(corpus, 10)
    val srcTable = Files.createTempDirectory("graft_anncdc_src").toString + "/t"
    val idxTable = Files.createTempDirectory("graft_anncdc_idx").toString + "/t"
    // vectors land over three source commits
    CommitLog.append(corpus.filter(col("vec_id") < 200), srcTable)
    CommitLog.append(corpus.filter(col("vec_id") >= 200 && col("vec_id") < 400), srcTable)
    CommitLog.append(corpus.filter(col("vec_id") >= 400), srcTable)
    // crash AFTER the first micro-batch's durable index commit; the
    // resume must pick up from the consumed= ledger — no vector twice
    intercept[RuntimeException] {
      IvfRefresh.drainIntoLoggedIndex(spark, srcTable, corpus.schema, idxTable,
        cents, maxVersionsPerBatch = 1L,
        afterBatch = (n, _) => if (n == 1) throw new RuntimeException("boom"))
    }
    val d = IvfRefresh.drainIntoLoggedIndex(spark, srcTable, corpus.schema,
      idxTable, cents, maxVersionsPerBatch = 1L)
    assert(d.consumedThrough == 3L)
    val idxRows = CommitLog.read(spark, idxTable, IvfRefresh.loggedIndexSchema)
    assert(idxRows.count() == 500,
      "crash replay duplicated or lost vectors in the logged index")
    // drained index answers ≡ direct search over the full corpus
    val queries = corpus.filter(col("vec_id") < 5)
    val fromIndex = IvfRefresh.topKFromLoggedIndex(spark, idxTable, queries,
      k = 10, cents, nProbe = 3).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Similarity.ivfTopKWith(queries, corpus, k = 10, cents,
      nProbe = 3).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromIndex == direct, "drained logged index diverges from a rebuild")
    // a source DELETE retracts the rows from the index via the feed —
    // the row-level consistency a bare parquet-append index cannot keep
    CommitLog.deleteWhere(spark, srcTable, corpus.schema,
      col("vec_id") >= 100 && col("vec_id") < 200)
    IvfRefresh.drainIntoLoggedIndex(spark, srcTable, corpus.schema, idxTable,
      cents, maxVersionsPerBatch = 1L)
    assert(CommitLog.read(spark, idxTable, IvfRefresh.loggedIndexSchema)
      .count() == 400)
    val after = Similarity.ivfTopKWith(queries,
      corpus.filter(col("vec_id") < 100 || col("vec_id") >= 200),
      k = 10, cents, nProbe = 3).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val afterIdx = IvfRefresh.topKFromLoggedIndex(spark, idxTable, queries,
      k = 10, cents, nProbe = 3).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(afterIdx == after, "retracted vectors still answer from the index")
  }
}
