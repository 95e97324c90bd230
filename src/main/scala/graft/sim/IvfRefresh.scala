package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{AtomicPublisher, CommitLog, RenameOrLinkPublisher}

/** Drift-triggered IVF index lifecycle: monitor → (maybe) retrain →
  * atomic swap.
  *
  * An IVF index is a snapshot of the corpus's cluster structure; when
  * the corpus drifts (new sources, domain shift), the frozen centroids
  * partition the new data badly and recall decays at a fixed probe
  * budget. Retraining on every write is wasteful — the index rewrite is
  * the one corpus-sized operation here — so the refresh is GATED on the
  * cheap drift monitor ([[Similarity.sourceDrift]], scalar exchanges
  * only): only when the worst source's mean member-to-own-centroid
  * cosine falls below the caller's threshold does a rebuild run.
  *
  * Generations are published through a [[CommitLog]]-backed REGISTRY
  * table — a control-plane table of one row per index generation
  * (generation, index path, centroid set, drift reading at build time).
  * Each refresh writes a NEW index directory (`gen-<n>/`, never touching
  * the live one) and then appends one registry row; that single log
  * commit is the swap point, so readers move from gen n to gen n+1
  * atomically, in-flight readers of the old directory are undisturbed,
  * and `asOf` reads of the registry reproduce any historical
  * generation (the CommitLog time-travel contract). A crashed refresh
  * leaves an unreferenced index directory and no registry row —
  * invisible, reclaimable, never a torn index.
  *
  * Scale shape: the monitor is sourceDrift (nothing array-typed crosses
  * an exchange); training is Lloyd's with k-bounded driver state; the
  * registry is k×dims-sized per row — the only corpus-sized cost is the
  * gated index rewrite itself, which is exactly the cost the trigger
  * exists to avoid paying on every cycle.
  *
  * Provenance: the reference refreshes derived artifacts only when a
  * re-scan shows upstream change (`tasker/service.go` re-plan on
  * ingest delta); this transplants that trigger-not-schedule shape to
  * the vector-index surface.
  */
object IvfRefresh {

  /** One published index generation, as read back from the registry. */
  case class IndexGen(
      generation: Long,
      indexPath: String,
      centroids: Similarity.Centroids,
      minSourceCos: Double)

  /** What a refresh call did and the generation now live. */
  case class RefreshResult(refreshed: Boolean, reason: String, gen: IndexGen)

  /** Registry row layout. Centroids ride as a flat text encoding
    * (`cid:v1,v2,…;cid:…`) — k×dims doubles, control-plane-sized; the
    * f64 round trip is exact via toString/toDouble. */
  val registrySchema: StructType = StructType(Seq(
    StructField("generation", LongType),
    StructField("index_path", StringType),
    StructField("centroids", StringType),
    StructField("min_source_cos", DoubleType)))

  private def encodeCents(cents: Similarity.Centroids): String =
    cents.map { case (cid, v) => s"$cid:" + v.mkString(",") }.mkString(";")

  private def decodeCents(s: String): Similarity.Centroids =
    s.split(';').toSeq.map { part =>
      val i = part.indexOf(':')
      (part.substring(0, i).toLong,
        part.substring(i + 1).split(',').toSeq.map(_.toDouble))
    }

  /** The generation readers should search, if any has been published.
    * Snapshot-consistent: one registry read at one log version. */
  def currentGeneration(spark: SparkSession, registryPath: String,
      asOf: Long = Long.MaxValue): Option[IndexGen] =
    CommitLog.read(spark, registryPath, registrySchema, asOf)
      .orderBy(col("generation").desc).limit(1)
      .collect().headOption
      .map(r => IndexGen(r.getLong(0), r.getString(1),
        decodeCents(r.getString(2)), r.getDouble(3)))

  /** The scalar drift trigger: the WORST source's mean cosine of
    * members to their own centroid (a scattered source reads low).
    * Corpora with no usable drift rows (all-zero vectors everywhere)
    * read as fully drifted — a monitor that cannot see must not
    * silently report health. */
  def minSourceCos(docs: DataFrame, emb: DataFrame): Double =
    Similarity.sourceDrift(docs, emb).agg(min("avg_cos"))
      .collect().headOption.filterNot(_.isNullAt(0)).map(_.getDouble(0))
      .getOrElse(Double.NegativeInfinity)

  /** Retrain-and-swap iff the corpus has drifted past `minCosThreshold`
    * (or no index exists yet — bootstrap always builds). Returns what
    * happened and the live generation either way. The new index lands
    * at `indexRoot/gen-<n>` and becomes visible only through the
    * registry commit. */
  def refreshIndexIfDrifted(docs: DataFrame, emb: DataFrame,
      registryPath: String, indexRoot: String, minCosThreshold: Double,
      numCentroids: Int = 10, trainIters: Int = 3,
      publisher: AtomicPublisher = RenameOrLinkPublisher): RefreshResult = {
    val spark = emb.sparkSession
    val current = currentGeneration(spark, registryPath)
    val drift = minSourceCos(docs, emb)

    def build(gen: Long, reason: String): RefreshResult = {
      val cents = Similarity.trainCentroids(emb, numCentroids, trainIters)
      val path = s"$indexRoot/gen-$gen"
      Similarity.writeIvfIndex(emb, path, cents)
      import spark.implicits._
      val row = Seq((gen, path, encodeCents(cents), drift))
        .toDF("generation", "index_path", "centroids", "min_source_cos")
      CommitLog.append(row, registryPath, publisher)
      RefreshResult(refreshed = true, reason, IndexGen(gen, path, cents, drift))
    }

    current match {
      case None => build(1L, "bootstrap: no generation published")
      case Some(gen) if drift < minCosThreshold =>
        build(gen.generation + 1,
          f"drifted: min source cos $drift%.4f < $minCosThreshold%.4f")
      case Some(gen) =>
        RefreshResult(refreshed = false,
          f"healthy: min source cos $drift%.4f >= $minCosThreshold%.4f", gen)
    }
  }

  /** Reclaim index generation directories: everything under
    * `indexRoot` except the newest `keepLatest` published generations,
    * age-gated like [[CommitLog.vacuum]] so an in-flight refresh's
    * half-written directory (not yet published — invisible) is never
    * eaten. Reclaims BOTH superseded generations and crashed-refresh
    * orphans (directories no registry row ever referenced). After a
    * vacuum, registry `asOf` reads older than the keep horizon still
    * return their metadata but can no longer be served — the same
    * time-travel-until-vacuumed contract as the commit log itself.
    * Returns the reclaimed directory names. */
  def vacuumGenerations(spark: SparkSession, registryPath: String,
      indexRoot: String, keepLatest: Int = 2, minAgeMs: Long = 0L): Seq[String] = {
    require(keepLatest >= 1, s"keepLatest must be >= 1: $keepLatest")
    require(minAgeMs >= 0, s"minAgeMs must be >= 0: $minAgeMs")
    val keep = CommitLog.read(spark, registryPath, registrySchema)
      .orderBy(col("generation").desc).limit(keepLatest)
      .collect().map(r => new org.apache.hadoop.fs.Path(r.getString(1)).getName).toSet
    val root = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val cutoff = System.currentTimeMillis() - minAgeMs
    fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && !keep(st.getPath.getName) &&
          st.getModificationTime <= cutoff =>
        fs.delete(st.getPath, true)
        st.getPath.getName
    }
  }

  /** Search the live generation: partition-pruned probe of the at-rest
    * index ([[Similarity.ivfTopKFromIndex]]). */
  def topK(spark: SparkSession, registryPath: String, queries: DataFrame,
      k: Int, nProbe: Int = 3): DataFrame = {
    val gen = currentGeneration(spark, registryPath).getOrElse(
      throw new IllegalStateException(s"no index generation published at $registryPath"))
    Similarity.ivfTopKFromIndex(spark, gen.indexPath, queries, k, gen.centroids, nProbe)
  }

  // ── storage ↔ ANN: the change feed as the index maintenance loop ────

  /** The LOGGED form of the at-rest IVF index: `(vec_id, e, cid)` in a
    * commit-log table, cell-assigned under frozen centroids. Trades
    * directory-partition pruning for the logged layer's machinery —
    * exactly-once incremental maintenance, row-level retraction,
    * time travel, and `compact(clusterBy = "cid")` re-clustering so
    * probe filters prune files by range stats instead of directories. */
  val loggedIndexSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("e", ArrayType(DoubleType)),
    StructField("cid", LongType)))

  /** Drain a LOGGED embeddings table's change feed into a logged IVF
    * index mirror — the storage↔ANN composite: vectors land in the
    * corpus table, the drain assigns each increment to its cell under
    * the FROZEN centroids (the exact insert path appendToIvfIndex
    * argues — assignment depends only on (vector, centroids)), and the
    * index grows by increment-sized commits. Source DELETEs and merge
    * updates flow through as keyed retractions — the logged index
    * stays row-for-row consistent with the corpus, which a bare
    * parquet-append index cannot do. Exactly-once rides the sink's
    * `consumed=` ledger (CdcStream.drain): a crash mid-drain resumes
    * without double-inserting a vector. Geometry refresh stays the
    * separate drift-triggered retrain ([[refreshIndexIfDrifted]]). */
  def drainIntoLoggedIndex(spark: SparkSession, srcTable: String,
      srcSchema: StructType, indexTable: String, cents: Similarity.Centroids,
      maxVersionsPerBatch: Long = 10L,
      publisher: AtomicPublisher = RenameOrLinkPublisher,
      afterBatch: (Long, Long) => Unit = (_, _) => ()): graft.store.CdcStream.Drained =
    graft.store.CdcStream.drain(spark, srcTable, srcSchema, indexTable,
      df => df.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("e"))
        .withColumn("cid", Similarity.nearestCid(df, cents, col("e"))),
      keyCols = Some(Seq("vec_id")),
      maxVersionsPerBatch = maxVersionsPerBatch,
      publisher = publisher, afterBatch = afterBatch)

  /** IVF top-k against the LOGGED index: probed cells become an `isin`
    * predicate over the `cid` column — parquet row-group stats (and,
    * after a `compact(clusterBy = "cid")`, whole-file range pruning)
    * stand in for the directory pruning of the unlogged form; results
    * are identical to a full rebuild's (the shared IVF oracle). */
  def topKFromLoggedIndex(spark: SparkSession, indexTable: String,
      queries: DataFrame, k: Int, cents: Similarity.Centroids,
      nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = queries
      .select(col("vec_id").as("query_id"),
        Similarity.asDouble(col("embedding")).as("qe"))
      .withColumn("cid",
        explode(Similarity.probeCids(queries, cents, col("qe"), nProbe)))
    val probedCells = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val cells = CommitLog.read(spark, indexTable, loggedIndexSchema)
      .filter(col("cid").isin(probedCells: _*))
    val scored = cells.join(broadcast(probes), "cid")
      .select(col("query_id"), col("vec_id"),
        Similarity.nativeCosine(queries)(col("qe"), col("e")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }
}
