package graft.sim

import graft.core.Hashing
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search operators over an embedding column
  * (`array<float>`) — builder brief: brute-force cosine top-k as the
  * exact baseline, plus bucketed variants (IVF, sign-LSH) as the scale
  * path. The reference has no vector surface; this is the §7.2-step-6
  * extension family.
  *
  * Scale design:
  *  - All vector math is double-precision builtin expressions
  *    (zip_with + aggregate) inside codegen — no UDFs, so the DuckDB
  *    oracle recomputes identical scores.
  *  - Brute force is broadcast(queries) × corpus: one pass over the
  *    corpus, no corpus shuffle, top-k via per-query window. Exact, but
  *    O(|Q|·N) — the small-|Q| baseline.
  *  - IVF: corpus is assigned to its nearest centroid once (a
  *    broadcast join against the small centroid set), queries probe
  *    only the nProbe nearest cells. At 100 TB the assignment is a
  *    write-once clustering key (partition pruning does the cell
  *    selection); compute drops by ×(cells/nProbe).
  *  - Sign-LSH: deterministic ±1 hyperplanes (seeded from md5, built
  *    driver-side as literals); bucket = sign-bit string per table.
  *    Candidates join on (table, bucket) equality — a hash join, never
  *    a cross join.
  */
object Similarity {

  /** Element-wise cast to double — all scoring happens in f64.
    * Native array Cast, NOT `transform(a, _.cast("double"))`: higher-
    * order functions run interpreted (one boxed lambda call per
    * element per row — the SKILL/guide §4 "prefer built-ins" rule),
    * while Cast(array→array) is codegen'd. Same semantics element for
    * element: an elementwise widening cast, null elements preserved
    * (SimilaritySpec covers the scoring paths; every ann_* oracle row
    * stayed hash-green across the swap). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Reference (interpreted) form — kept for the equivalence spec;
    * the operators below use the codegen'd native expression. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Codegen'd cosine (graft.functions.CosineSimilarity), registered
    * idempotently on the frame's session. Bit-identical to `cosine`
    * (both accumulate left-to-right in f64). */
  private[sim] def nativeCosine(df: DataFrame)(a: Column, b: Column): Column = {
    GraftFunctions.register(df.sparkSession)
    GraftFunctions.cosine(a, b)
  }

  /** Exact top-k: per query row, rank the whole corpus by cosine.
    * `queries`/`corpus` must expose (idCol, vecCol); ids must not clash
    * in name with each other after aliasing. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("ce"))
    val scored = broadcast(q).crossJoin(c)
      .select(col("query_id"), col("vec_id"),
        nativeCosine(corpus)(col("qe"), col("ce")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** PRODUCT QUANTIZATION top-k: each corpus vector is compressed to
    * `m` small codes (nearest codebook entry per contiguous subspace)
    * and queries rank by the ADC squared-L2 against the codes'
    * reconstruction — approximate, but the scan reads m ints per
    * candidate instead of d floats (×(d·4/m) memory compression; with
    * d=64, m=4 that is 64×), which is what lets a 100 TB corpus keep
    * its whole index hot. Both kernels are native codegen expressions
    * (`graft_pq_encode` / `graft_pq_adc`), the codebook is the
    * first-`numCodes`-by-id seed (driver-side, codebook-sized — the
    * same oracle-replayable convention as the IVF centroids), and
    * encoding is a per-row map over the corpus with no shuffle; at
    * scale the encoded table is written once and reused per query
    * batch. Tie-break: lowest code on equidistant subspaces, lowest
    * vec_id on equal scores — matching the DuckDB oracle's windows. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int, numCodes: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cb = pqCodebook(corpus, numCodes)
    require(cb.nonEmpty && cb.head.size % m == 0,
      s"embedding dim ${cb.headOption.fold(0)(_.size)} must divide into $m subspaces")
    val cbLit = typedLit(cb)
    val enc = corpus.select(col("vec_id"),
      call_function("graft_pq_encode", asDouble(col("embedding")), cbLit,
        lit(m)).as("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qe"))
    val scored = broadcast(q).crossJoin(enc)
      .select(col("query_id"), col("vec_id"),
        call_function("graft_pq_adc", col("qe"), col("codes"), cbLit,
          lit(m)).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** PQ codebook seed: the first `numCodes` corpus vectors by id
    * (TakeOrdered, codebook-sized collect — index metadata, not data). */
  def pqCodebook(corpus: DataFrame, numCodes: Int): Seq[Seq[Double]] =
    corpus.select(col("vec_id"), asDouble(col("embedding")))
      .orderBy(col("vec_id")).limit(numCodes)
      .collect().map(_.getSeq[Double](1)).toSeq

  /** IVF-PQ — the two halves composed (the FAISS IVF-PQ architecture):
    * IVF cell pruning bounds WHICH candidates a query touches
    * (×cells/nProbe compute drop), PQ code compression bounds what
    * each candidate COSTS (m ints instead of d floats). The index
    * frame is (vec_id, cid, codes) — at rest, cid-partitioned like
    * writeIvfIndex, it is the memory-resident posting-list layout real
    * vector stores ship. Plan shape: corpus scan → per-row cid + codes
    * (no exchange carries an embedding) → broadcast-hash join against
    * the (|Q|×nProbe)-row probe set → scalar ADC projection → one
    * (query_id, vec_id, score) shuffle for the top-k window. Cells are
    * probed by cosine (the IVF convention here), candidates ranked by
    * ADC squared-L2. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int, nProbe: Int, m: Int, numCodes: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cents = initialCentroids(corpus, numCentroids)
    val cb = pqCodebook(corpus, numCodes)
    require(cb.nonEmpty && cb.head.size % m == 0,
      s"embedding dim ${cb.headOption.fold(0)(_.size)} must divide into $m subspaces")
    val cbLit = typedLit(cb)
    val index = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("cid", nearestCid(corpus, cents, col("e")))
      .select(col("vec_id"), col("cid"),
        call_function("graft_pq_encode", col("e"), cbLit, lit(m)).as("codes"))
    val probes = queries
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
      .withColumn("cid", explode(probeCids(queries, cents, col("qe"), nProbe)))
    val scored = index.join(broadcast(probes), "cid")
      .select(col("query_id"), col("vec_id"),
        call_function("graft_pq_adc", col("qe"), col("codes"), cbLit,
          lit(m)).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** The centroid vector of `cid` as a column — a k-way when-chain
    * over the driver-held centroid table (k = centroid count, codegen
    * stays linear); shared by the residual encode and probe sides so
    * the two subtract the SAME vector. */
  private def centroidVec(cents: Centroids, cid: Column): Column =
    cents.tail.foldLeft(
      when(cid === cents.head._1, litVec(cents.head._2))) {
      case (acc, (c, v)) => acc.when(cid === c, litVec(v))
    }

  /** IVF-PQ with RESIDUAL encoding — the FAISS IndexIVFPQ convention:
    * each vector is coded as the residual to ITS CELL CENTROID rather
    * than raw. Residuals of clustered data are small and centered, so
    * the same code budget (m × numCodes) spends its quantization
    * resolution on the part the cell assignment has not already
    * explained — recall at equal budget beats-or-ties the raw-vector
    * [[ivfPqTopK]] on clustered corpora (spec-pinned). ADC compares
    * the QUERY's residual to the same probed cell against the coded
    * reconstruction: ‖(q−c) − recon(x−c)‖² = ‖q − (c + recon)‖², the
    * proper IVF-PQ distance.
    *
    * The residual codebook is the deterministic seed convention ON THE
    * RESIDUAL SPACE: residuals of the first `numCodes` corpus vectors
    * by id, each minus its own cell centroid — computed through the
    * same column expressions the index uses, so the oracle replays it.
    * Plan shape is [[ivfPqTopK]] unchanged: per-row cid + residual +
    * codes (no exchange carries an embedding), broadcast probe join,
    * scalar ADC, one top-k window. */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int, nProbe: Int, m: Int, numCodes: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cents = initialCentroids(corpus, numCentroids)
    def residual(e: Column, cid: Column): Column =
      zip_with(e, centroidVec(cents, cid), (a, b) => a - b)
    val rcb: Seq[Seq[Double]] = corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .orderBy(col("vec_id")).limit(numCodes)
      .withColumn("cid", nearestCid(corpus, cents, col("e")))
      .select(col("vec_id"), residual(col("e"), col("cid")).as("r"))
      .orderBy(col("vec_id"))
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    require(rcb.nonEmpty && rcb.head.size % m == 0,
      s"embedding dim ${rcb.headOption.fold(0)(_.size)} must divide into $m subspaces")
    val rcbLit = typedLit(rcb)
    val index = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("cid", nearestCid(corpus, cents, col("e")))
      .select(col("vec_id"), col("cid"),
        call_function("graft_pq_encode", residual(col("e"), col("cid")),
          rcbLit, lit(m)).as("codes"))
    val probes = queries
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
      .withColumn("cid", explode(probeCids(queries, cents, col("qe"), nProbe)))
      .select(col("query_id"), col("cid"),
        residual(col("qe"), col("cid")).as("qres"))
    val scored = index.join(broadcast(probes), "cid")
      .select(col("query_id"), col("vec_id"),
        call_function("graft_pq_adc", col("qres"), col("codes"), rcbLit,
          lit(m)).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** IVF-PQ with a REFINE stage (FAISS's `refine` flag / IndexRefine):
    * the ADC pass is lossy — scores come from each candidate's
    * reconstruction, so the true nearest neighbor can sit at ADC rank
    * k+2 and fall off a plain IVF-PQ top-k. The refine stage keeps the
    * compression's candidate-bounding value but buys back ranking
    * accuracy: take the top `refineFactor`·k ADC candidates per query
    * (the shortlist), fetch the TRUE embeddings for only those
    * |Q|·c·k rows, and re-rank them by exact cosine.
    *
    * Scale shape: the expensive full-vector read touches c·k
    * candidates per query, never the corpus — the shortlist is
    * query-batch-sized, so it BROADCASTS into a hash join against the
    * corpus scan (which streams; no corpus shuffle, no second
    * embedding exchange), and the final top-k window shuffles only
    * (query_id, vec_id, score) scalars. Recall is ≥ plain IVF-PQ at
    * the same probe budget by construction: the refine stage re-ranks
    * a superset of the plain top-k using exact scores (spec-pinned).
    * Output ranks by cosine DESC (the exact metric), lowest vec_id on
    * ties — the brute-force convention, since the final scores ARE
    * exact. */
  def ivfPqRefineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int, nProbe: Int, m: Int, numCodes: Int,
      refineFactor: Int): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1: $refineFactor")
    refineExact(ivfPqTopK(queries, corpus, k * refineFactor,
      numCentroids, nProbe, m, numCodes), queries, corpus, k)
  }

  /** [[ivfPqRefineTopK]] on the RESIDUAL-coded shortlist — the full
    * FAISS serving stack (IndexIVFPQ + IndexRefine): residual ADC
    * picks refineFactor·k candidates, exact cosine re-ranks them.
    * Recall ≥ plain residual IVF-PQ at equal probe budget by
    * construction (the refine invariant, spec-pinned for both coding
    * variants); same broadcast-shortlist plan shape. */
  def ivfPqResidualRefineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int, nProbe: Int, m: Int, numCodes: Int,
      refineFactor: Int): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1: $refineFactor")
    refineExact(ivfPqResidualTopK(queries, corpus, k * refineFactor,
      numCentroids, nProbe, m, numCodes), queries, corpus, k)
  }

  /** The refine stage both coding variants share: fetch TRUE
    * embeddings for the (query-batch-sized, broadcast) shortlist only
    * and re-rank by exact cosine — the corpus scan streams, no corpus
    * shuffle, the final window moves scalars. */
  private def refineExact(shortlistRanked: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val shortlist = shortlistRanked.select("query_id", "vec_id")
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qe"))
    val rescored = corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("ce"))
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        nativeCosine(corpus)(col("qe"), col("ce")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Materialize the PQ-CODED IVF index at rest: one parquet partition
    * directory per cell, rows (vec_id, codes) — m small ints per
    * vector instead of d floats, the memory-resident coded
    * posting-list layout real vector stores ship ([[writeIvfIndex]]
    * stores raw vectors; this is its compressed sibling for corpora
    * whose raw embeddings don't fit the serving tier). Returns the
    * codebook used (driver-held index metadata the probe needs, like
    * the centroids). Incremental INSERT works exactly as
    * [[appendToIvfIndex]]: under fixed (centroids, codebook) the row
    * for a vector is a pure function of the vector, so appends are
    * exact. */
  def writeIvfPqIndex(corpus: DataFrame, path: String, cents: Centroids,
      m: Int, numCodes: Int): Seq[Seq[Double]] = {
    GraftFunctions.register(corpus.sparkSession)
    val cb = pqCodebook(corpus, numCodes)
    require(cb.nonEmpty && cb.head.size % m == 0,
      s"embedding dim ${cb.headOption.fold(0)(_.size)} must divide into $m subspaces")
    val cbLit = typedLit(cb)
    corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("cid", nearestCid(corpus, cents, col("e")))
      .select(col("vec_id"), col("cid"),
        call_function("graft_pq_encode", col("e"), cbLit, lit(m)).as("codes"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    cb
  }

  /** IVF-PQ top-k against the written coded index: probed cells become
    * a literal partition filter (directory pruning, the
    * [[ivfTopKFromIndex]] contract incl. its MaxProbedCells bound),
    * then the scan reads m ints per candidate and ADC ranks — results
    * identical to [[ivfPqTopK]] over the same (centroids, codebook)
    * (shared oracle). */
  def ivfPqTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame, k: Int, cents: Centroids,
      cb: Seq[Seq[Double]], nProbe: Int, m: Int): DataFrame = {
    GraftFunctions.register(spark)
    require(cents.size <= MaxProbedCells,
      s"${cents.size} centroids exceed the probed-cells literal bound " +
        s"$MaxProbedCells — an isin over that many partition values " +
        "evaluates per file and prunes nothing; re-shard the index with " +
        "a coarser quantizer or probe via ivfTopKLarge")
    val cbLit = typedLit(cb)
    val probes = queries
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
      .withColumn("cid", explode(probeCids(queries, cents, col("qe"), nProbe)))
    val probedCells = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val cells = spark.read.parquet(indexPath)
      .filter(col("cid").isin(probedCells: _*))
    val scored = cells.join(broadcast(probes), "cid")
      .select(col("query_id"), col("vec_id"),
        call_function("graft_pq_adc", col("qe"), col("codes"), cbLit,
          lit(m)).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** CLUSTER-STRATIFIED DIVERSITY SAMPLE — the selection step a
    * training-data pipeline runs between dedup and mixing: source- or
    * quality-stratified sampling keeps PROVENANCE balance, but a
    * corpus can still be semantically lopsided inside each source;
    * this samples a fixed budget PER EMBEDDING CLUSTER, so every
    * semantic region keeps representation. Assignment is the IVF
    * zero-shuffle per-row centroid argmin (same first-k centroid seed
    * and tie-breaks as the ANN family, so the oracle replays it);
    * within a cluster, rows rank by centrality (cosine to the
    * centroid, DESC — most-typical first; lowest vec_id on ties) and
    * the top `perCluster` survive. Plan shape: corpus scan → per-row
    * cid + score (no exchange carries an embedding) → one
    * (cid, vec_id, score) scalar shuffle for the per-cluster window.
    * At 100 TB: the window partitions by cid (k partitions) — for
    * huge per-cluster populations swap the window for a TakeOrdered
    * per cid; at the k ≪ corpus sizes this targets, partial
    * aggregation keeps the shuffle scalar-thin. */
  def clusterStratifiedSample(corpus: DataFrame, numCentroids: Int,
      perCluster: Int): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive: $perCluster")
    val cents = initialCentroids(corpus, numCentroids)
    // ONE evaluation of the k per-centroid cosines yields BOTH the
    // assignment and the centrality: the argmax struct's score field
    // IS the cosine to the own centroid (recomputing it in a per-cid
    // when-chain would double the per-row vector work)
    val best =
      if (cents.sizeIs == 1)
        struct(nativeCosine(corpus)(col("e"), litVec(cents.head._2)).as("score"),
          lit(-cents.head._1).as("neg_cid"))
      else greatest(centScores(corpus, cents, col("e")): _*)
    val w = Window.partitionBy("cid").orderBy(col("score").desc, col("vec_id"))
    corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("best", best)
      .select(col("vec_id"), (-col("best.neg_cid")).as("cid"),
        col("best.score").as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perCluster)
      .select(col("cid"), col("rank"), col("vec_id"), col("score"))
  }

  /** The IVF index metadata: (cid, centroid vector) pairs, held
    * driver-side. Bounded by k — NEVER corpus-proportional — exactly the
    * state a real IVF index keeps in RAM; the k-row collect below is the
    * index build, not a driver-side data loop. */
  type Centroids = Seq[(Long, Seq[Double])]

  private def litVec(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** Untrained centroid seed: the first `k` corpus vectors by id
    * (orderBy+limit = TakeOrdered, bounded by k rows, so sparse or
    * offset id spaces still yield exactly k centroids). This is the
    * oracle-checked path — DuckDB recomputes it with an
    * `ORDER BY vec_id LIMIT k` CTE. */
  def initialCentroids(corpus: DataFrame, k: Int): Centroids =
    corpus.select(col("vec_id").cast("long"), asDouble(col("embedding")))
      .orderBy(col("vec_id")).limit(k)
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Per-centroid (score, -cid) structs for one row's vector. Struct
    * ordering compares fields left to right, so the MAX struct is the
    * (highest-score, lowest-cid) centroid — the same tie-break as a
    * `row_number ... ORDER BY score DESC, cid` window, with zero
    * exchange: the centroid set rides into codegen as literal arrays. */
  private def centScores(df: DataFrame, cents: Centroids, vec: Column): Seq[Column] =
    cents.map { case (cid, cv) =>
      struct(nativeCosine(df)(vec, litVec(cv)).as("score"), lit(-cid).as("neg_cid"))
    }

  /** Nearest-centroid id as a PER-ROW expression — the cell assignment
    * never shuffles (round-2/3 audit: the window form exchanged
    * |corpus|×k rows each carrying two embedding arrays). */
  private[sim] def nearestCid(df: DataFrame, cents: Centroids, vec: Column): Column =
    if (cents.sizeIs == 1) lit(cents.head._1)
    else -greatest(centScores(df, cents, vec): _*).getField("neg_cid")

  /** The `nProbe` nearest cell ids for one row, best first — sort_array
    * DESC on (score, -cid) structs gives score DESC, cid ASC. */
  private[sim] def probeCids(df: DataFrame, cents: Centroids, vec: Column, nProbe: Int): Column =
    transform(
      slice(sort_array(array(centScores(df, cents, vec): _*), asc = false), 1, nProbe),
      s => -s.getField("neg_cid"))

  /** Lloyd's k-means over the corpus, k fixed: assign per-row (zero
    * shuffle), re-estimate means via posexplode + groupBy(cid, pos) —
    * one scalar-column shuffle of (cid, pos, x) per iteration, partial
    * aggregation map-side. The k×dim mean collect is index-sized (k
    * vectors), not data-sized. Empty cells keep their previous centroid.
    *
    * NOT oracle-bound: a distributed f64 mean's summation order is
    * partition-dependent, so trained centroids are bit-stable only
    * within one engine — recall (not hashes) is the spec for this path
    * (SimilaritySpec). */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int): Centroids = {
    val emb = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    var cents = initialCentroids(corpus, k)
    for (_ <- 0 until iters) {
      val means = emb
        .select(nearestCid(corpus, cents, col("e")).as("cid"),
          posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      cents = cents.map { case (cid, old) =>
        val updated = old.indices.map(p => means.get((cid, p)))
        if (updated.forall(_.isDefined)) (cid, updated.map(_.get)) else (cid, old)
      }
    }
    cents
  }

  /** IVF top-k. The centroid count is FIXED, not a fraction of the
    * corpus: a corpus-proportional selection would grow unboundedly with
    * data volume — real IVF indexes pick k by memory/recall budget, not
    * corpus size. Each corpus vector is assigned to its nearest centroid
    * PER ROW (no exchange); each query probes the `nProbe` nearest cells
    * and ranks only their members. `trainIters > 0` runs Lloyd's
    * iterations from the first-k seed (approximate path — see
    * trainCentroids).
    *
    * Plan shape at scale: corpus scan → per-row cid → broadcast-hash
    * join against the (|Q|×nProbe)-row probe set → scalar projection →
    * one shuffle of (query_id, vec_id, score) for the top-k window. No
    * exchange anywhere carries an embedding array (pinned by
    * PlanAuditSpec). At rest the assignment is a write-once clustering
    * key — partitioning the corpus by cid makes probing partition
    * pruning. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int = 10, nProbe: Int = 3, trainIters: Int = 0): DataFrame = {
    val cents =
      if (trainIters > 0) trainCentroids(corpus, numCentroids, trainIters)
      else initialCentroids(corpus, numCentroids)
    ivfTopKWith(queries, corpus, k, cents, nProbe)
  }

  /** Materialize the corpus as an IVF-partitioned table: one parquet
    * partition directory per cell (`cid=<n>/`). This is the at-rest
    * form of the index the ivfTopK docs promise: the cell assignment is
    * a write-once clustering key, and probing becomes PARTITION PRUNING
    * — a 100 TB corpus with k=4096 cells and nProbe=32 reads <1% of its
    * files, no filter evaluation, no shuffle. */
  def writeIvfIndex(corpus: DataFrame, path: String, cents: Centroids): Unit =
    assignAndWrite(corpus, path, cents, "overwrite")

  /** Incremental INSERT path of the at-rest index: assign the new
    * vectors to the EXISTING centroids (the same zero-shuffle per-row
    * argmin) and append their files under the matching `cid=`
    * partition directories — work scales with the increment, never a
    * rebuild, and probing picks the new files up with no reader
    * change. Under fixed centroids this is EXACT, not approximate:
    * append-then-probe ≡ rebuild-then-probe (the shared
    * `ann_ivf_index_topk` oracle pins it), because cell assignment
    * depends only on (vector, centroids). What an insert-only index
    * does degrade over time is cell BALANCE under distribution drift —
    * which is precisely the `IvfRefresh.refreshIndexIfDrifted` trigger:
    * inserts handle volume, the drift monitor decides when geometry
    * has moved enough to pay for retraining. */
  def appendToIvfIndex(newVectors: DataFrame, path: String, cents: Centroids): Unit =
    assignAndWrite(newVectors, path, cents, "append")

  private def assignAndWrite(vectors: DataFrame, path: String,
      cents: Centroids, mode: String): Unit =
    vectors.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("cid", nearestCid(vectors, cents, col("e")))
      .write.mode(mode).partitionBy("cid").parquet(path)

  /** IVF top-k against a written index: the probed cell ids become an
    * `isin` literal filter on the partition column, so the scan prunes
    * to nProbe directories before reading a byte (pinned by
    * SimilaritySpec's PartitionFilters assertion). Results are
    * identical to ivfTopKWith over the same centroids. */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String,
      queries: DataFrame, k: Int, cents: Centroids, nProbe: Int): DataFrame = {
    val scored = ivfScoredFromIndex(spark, indexPath, queries, cents, nProbe)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** The probed-cells literal-predicate bound ([[ivfScoredFromIndex]]):
    * past this an isin partition filter stops being a pruning win. */
  val MaxProbedCells: Int = 100000

  /** The partition-pruned candidate stream shared by
    * [[ivfTopKFromIndex]] and [[hardNegativesFromIndex]]. */
  private def ivfScoredFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame, cents: Centroids,
      nProbe: Int): DataFrame = {
    // the probed cell set is index metadata (≤ |Q| × nProbe, and never
    // more than the centroid count) — collected so the scan sees a
    // LITERAL partition predicate. The literal-predicate contract,
    // enforced: each cell id lands in the scan's partition filter, so
    // the bound is the centroid count itself — which writeIvfIndex
    // capped when it built the index (cells are partition DIRECTORIES;
    // a k past ~10⁵ belongs on a coarser quantizer, not more
    // partitions). A probe set that big stops pruning anything anyway:
    // probing most cells IS a full scan — use ivfTopKLarge then.
    require(cents.size <= MaxProbedCells,
      s"${cents.size} centroids exceed the probed-cells literal bound " +
        s"$MaxProbedCells — an isin over that many partition values " +
        "evaluates per file and prunes nothing; re-shard the index with " +
        "a coarser quantizer or probe via ivfTopKLarge")
    val probes = queries
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
      .withColumn("cid", explode(probeCids(queries, cents, col("qe"), nProbe)))
    val probedCells = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val cells = spark.read.parquet(indexPath)
      .filter(col("cid").isin(probedCells: _*))
    cells.join(broadcast(probes), "cid")
      .select(col("query_id"), col("vec_id"),
        nativeCosine(queries)(col("qe"), col("e")).as("score"))
  }

  /** [[hardNegatives]] against the AT-REST cid-partitioned index
    * ([[writeIvfIndex]]): candidate selection is PARTITION PRUNING —
    * the mining batch reads only its probed cells' directories — and
    * the exclusions + rank cut are [[rankNegatives]] unchanged, so
    * results match the in-memory variant over the same centroids
    * (shared oracle). The broadcast probe suits eval-scale anchor
    * batches; a full-training-set sweep belongs on
    * [[hardNegativesLarge]] over the corpus table itself. */
  def hardNegativesFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, anchors: DataFrame, k: Int, cents: Centroids,
      nProbe: Int, dupThreshold: Double,
      positives: Option[DataFrame] = None): DataFrame =
    rankNegatives(ivfScoredFromIndex(spark, indexPath, anchors, cents, nProbe),
      k, dupThreshold, positives)

  /** Shared IVF candidate scoring: corpus assigned per-row, queries
    * probe nProbe cells, candidates scored by exact cosine — the
    * (query_id, vec_id, score) stream both [[ivfTopKWith]] and
    * [[hardNegatives]] rank. */
  private def ivfScored(queries: DataFrame, corpus: DataFrame,
      cents: Centroids, nProbe: Int): DataFrame =
    ivfScoredWith(queries, corpus, cents, nProbe)(broadcast)

  /** [[ivfScored]]'s corpus-scale sibling for |Q| ≈ N probe sets
    * (hard-negative mining over a full training set): both sides keep
    * their embedding attached and meet in a SHUFFLE HASH join on the
    * scalar `cid` key — embeddings cross exactly these two keyed
    * exchanges, each linear in its own side, and every colliding pair
    * scores AT the join so only (query_id, vec_id, score) scalars flow
    * downstream. The [[lshTopKLarge]] pattern on the IVF probe shape. */
  private def ivfScoredLarge(queries: DataFrame, corpus: DataFrame,
      cents: Centroids, nProbe: Int): DataFrame =
    ivfScoredWith(queries, corpus, cents, nProbe)(_.hint("shuffle_hash"))

  /** Assignment, probing and scoring shared by both IVF probe shapes —
    * `probeSide` picks the join strategy for the probe frame
    * (broadcast for serving batches, shuffle-hash for |Q| ≈ N), which
    * is the ONLY legitimate difference: a scoring or assignment change
    * lands in both variants by construction (SimilaritySpec pins the
    * result equivalence). */
  private def ivfScoredWith(queries: DataFrame, corpus: DataFrame,
      cents: Centroids, nProbe: Int)(
      probeSide: DataFrame => DataFrame): DataFrame = {
    val cells = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("cid", nearestCid(corpus, cents, col("e")))
    val probes = queries
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
      .withColumn("cid", explode(probeCids(queries, cents, col("qe"), nProbe)))
    cells.join(probeSide(probes), Seq("cid"))
      .select(col("query_id"), col("vec_id"),
        nativeCosine(corpus)(col("qe"), col("e")).as("score"))
  }

  /** IVF search against an explicit (pre-built/pre-trained) centroid set. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      cents: Centroids, nProbe: Int): DataFrame = {
    val scored = ivfScored(queries, corpus, cents, nProbe)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** [[ivfTopKWith]] for corpus-scale query batches (|Q| ≈ N): same
    * results, but the probe side is never broadcast — see
    * [[ivfScoredLarge]] for the plan shape. Use when the query set is
    * too large for an executor-resident broadcast (a full training
    * set); for serving-sized batches [[ivfTopKWith]]'s broadcast probe
    * is the cheaper plan. */
  def ivfTopKLarge(queries: DataFrame, corpus: DataFrame, k: Int,
      cents: Centroids, nProbe: Int): DataFrame = {
    val scored = ivfScoredLarge(queries, corpus, cents, nProbe)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Shared hard-negative ranking: self- and dup-band exclusion, the
    * optional known-positives anti-join, then the per-anchor top-k cut
    * over scalars only. */
  private def rankNegatives(scored: DataFrame, k: Int, dupThreshold: Double,
      positives: Option[DataFrame]): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(dupThreshold > -1.0 && dupThreshold <= 1.0,
      s"dupThreshold must be a cosine bound in (-1, 1]: $dupThreshold")
    val base = scored.filter(col("vec_id") =!= col("query_id") &&
      col("score") < dupThreshold)
    // Gold positives are excluded BEFORE the rank cut (a positive
    // surviving into slot k would not free its slot for a real
    // negative if filtered after). The exclusion frame is (anchor_id,
    // positive_id) scalar pairs — an anti-join on two scalar keys.
    val excl = positives.fold(base) { p =>
      base.join(p.select(col("anchor_id").as("query_id"),
          col("positive_id").as("vec_id")),
        Seq("query_id", "vec_id"), "left_anti")
    }
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    excl.withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("query_id").as("anchor_id"), col("neg_rank"),
        col("vec_id").as("negative_id"), col("score"))
  }

  /** Hard-negative mining for contrastive/embedding training (the
    * DPR/SimCSE recipe): per anchor, the top-`k` MOST similar corpus
    * vectors that are neither the anchor itself nor a near-duplicate
    * (`score ≥ dupThreshold` — a near-dup labeled "negative" is a
    * false negative that actively damages the contrastive loss, so
    * the dup band is excluded BEFORE the top-k cut, not after).
    * `positives` optionally supplies known gold (anchor_id,
    * positive_id) pairs — the DPR recipe's second exclusion: a gold
    * positive must never be emitted as a negative even when its cosine
    * sits below the dup band.
    *
    * Exactly the [[ivfTopKWith]] probe shape — assignment is the
    * zero-shuffle per-row argmin, candidates come from the anchor's
    * nProbe nearest cells, only (anchor, candidate, score) scalars
    * cross the final ranking exchange. The anchor set rides a
    * BROADCAST (with its embeddings), so this variant is for
    * broadcast-feasible anchor batches — eval sets, per-shard slices.
    * For a full-training-set anchor sweep (|anchors| ≈ corpus) use
    * [[hardNegativesLarge]], which swaps the broadcast for keyed
    * shuffle joins. At rest, probing the cid-partitioned index
    * ([[writeIvfIndex]]) makes candidate selection partition pruning. */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, k: Int,
      cents: Centroids, nProbe: Int, dupThreshold: Double,
      positives: Option[DataFrame] = None): DataFrame =
    rankNegatives(ivfScored(anchors, corpus, cents, nProbe), k,
      dupThreshold, positives)

  /** [[hardNegatives]] at full-training-set anchor scale (|anchors| ≈
    * corpus): identical semantics and results (SimilaritySpec pins the
    * equivalence), but candidates come from [[ivfScoredLarge]]'s keyed
    * shuffle joins — no broadcast carries the anchor set, embeddings
    * cross exactly the two `cid`-keyed exchanges, and the exclusions +
    * top-k cut exchange scalars only. */
  def hardNegativesLarge(anchors: DataFrame, corpus: DataFrame, k: Int,
      cents: Centroids, nProbe: Int, dupThreshold: Double,
      positives: Option[DataFrame] = None): DataFrame =
    rankNegatives(ivfScoredLarge(anchors, corpus, cents, nProbe), k,
      dupThreshold, positives)

  /** Margin-based bitext mining (Artetxe & Schwenk's ratio margin —
    * the LASER/CCMatrix recipe for mining parallel training pairs from
    * two monolingual corpora embedded in one space): a forward pair
    * (x, y) scores cos(x, y) normalized by the mean of both sides'
    * average-kNN similarity, which suppresses hubs (vectors similar to
    * everything) that a raw cosine threshold mines as false pairs.
    *
    *   margin(x, y) = cos(x, y) / ((avgNN_fwd(x) + avgNN_bwd(y)) / 2)
    *
    * `fwd`/`bwd` are the two directions' top-k frames in the engine's
    * ANN result shape (query_id, rank, vec_id, score) — from ANY kNN
    * supplier ([[bruteForceTopK]] for exact small sets, [[ivfTopKWith]]
    * / [[ivfTopKLarge]] / [[lshTopKLarge]] at scale), so the miner
    * composes with the whole similarity family instead of hard-wiring
    * one. Per source vector the BEST margin candidate survives
    * (forward mining), cut at `threshold`; margins are rounded to 6 dp
    * BEFORE the argmax (ties by target id) — the engine-wide
    * cross-engine cut discipline.
    *
    * Scale shape: both inputs are top-k-sized (|side| × k scalar
    * rows); the two averages are partial+final aggregates; candidate
    * margins join on scalar keys; one per-source window picks the
    * winner. Nothing here touches an embedding — the kNN supplier
    * already paid that cost under its own contract. */
  def marginBitextMine(fwd: DataFrame, bwd: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0, s"margin threshold must be positive: $threshold")
    val avgFwd = fwd.groupBy(col("query_id").as("src_id"))
      .agg(avg("score").as("avg_fwd"))
    val avgBwd = bwd.groupBy(col("query_id").as("tgt_id"))
      .agg(avg("score").as("avg_bwd"))
    val cand = fwd
      .select(col("query_id").as("src_id"), col("vec_id").as("tgt_id"),
        col("score").as("cos"))
      .join(avgFwd, "src_id")
      // a forward candidate absent from the backward query set has no
      // avgNN_bwd — margin undefined, the pair cannot be judged: inner
      // join drops it (bwd must cover the target side by contract)
      .join(avgBwd, "tgt_id")
      // a zero denominator (mutually orthogonal neighborhoods — every
      // kNN score 0) makes the margin NaN/Infinity, and Spark ranks
      // NaN ABOVE everything: such a pair would win the argmax and
      // pass any threshold. No similarity signal = nothing to mine.
      .filter(col("avg_fwd") + col("avg_bwd") > 0)
      .select(col("src_id"), col("tgt_id"), col("cos"),
        round(col("cos") / ((col("avg_fwd") + col("avg_bwd")) / 2.0), 6)
          .as("margin"))
    val w = Window.partitionBy("src_id")
      .orderBy(col("margin").desc, col("tgt_id"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn").filter(col("margin") >= threshold)
  }

  /** Deterministic ±1 hyperplane: component j of plane p in table t is
    * the parity of the first hex digit of sha256("t:p:j"). Built
    * driver-side (tiny) and embedded as literals — zero per-row hash
    * work. */
  def hyperplane(table: Int, plane: Int, dim: Int): Seq[Double] =
    (0 until dim).map { j =>
      val h = Hashing.sha256Hex(s"$table:$plane:$j")
      if ((Integer.parseInt(h.substring(0, 1), 16) & 1) == 1) 1.0 else -1.0
    }

  /** Sign-LSH bucket id for one table: the sign-bit string of the
    * vector's dot products with that table's hyperplanes. */
  def lshBucket(vec: Column, table: Int, planes: Int, dim: Int): Column =
    concat((0 until planes).map { p =>
      val plane = array(hyperplane(table, p, dim).map(lit): _*)
      when(dot(vec, plane) >= 0, "1").otherwise("0")
    }: _*)

  /** Multi-table sign-LSH ANN: candidates = corpus rows sharing any
    * table's bucket with the query, ranked exactly. Approximate —
    * recall is checked against bruteForceTopK in SimilaritySpec; the
    * buckets themselves are deterministic, so the whole query is also
    * oracle-bound (ann_lsh_topk). Defaults (8 tables × 5 planes = 32
    * buckets/table) are tuned for near-orthogonal random embeddings
    * where true neighbors sit at low cosine: candidate sets ~25% of the
    * corpus per query. Clustered real-world embeddings tolerate more
    * planes/fewer tables.
    *
    * Plan shape at scale: one fused-kernel pass per row computes all
    * table buckets (graft_lsh_buckets — the per-plane HOF dot form ran
    * 40 interpreted walks/row), the bucket join carries only
    * (id, tbl, bucket) scalars with the |Q|×tables query side
    * broadcast, and embeddings re-attach only to the candidate set —
    * no shuffle exchange anywhere carries an embedding array (pinned by
    * PlanAuditSpec). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 8, planes: Int = 5, dim: Int = 64): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    def buckets(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        posexplode(GraftFunctions.lshBuckets(col("embedding"), tables, planes, dim))
          .as(Seq("tbl", "bucket")))
    val cand = buckets(corpus, "vec_id")
      .join(broadcast(buckets(queries, "query_id")), Seq("tbl", "bucket"))
      .select(col("query_id"), col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("ce"))
    // candidate (query_id, vec_id) scalar pairs broadcast against the
    // corpus — the corpus never shuffles; bounded by |Q| × the LSH
    // collision fraction (small-|Q| serving; huge-|Q| batch rerank is a
    // different operator)
    val scored = c
      .join(broadcast(cand), "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        nativeCosine(corpus)(col("qe"), col("ce")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Corpus-scale batch LSH rerank — lshTopK's non-broadcast sibling
    * for |Q| ≈ N workloads (hard-negative mining, cross-corpus
    * retrieval), where broadcasting either the query buckets or the
    * candidate set would OOM the executors. Identical semantics and
    * results to lshTopK (SimilaritySpec pins the equivalence); only
    * the plan differs — the Spark ML approxSimilarityJoin shape:
    *
    *  - both bucket streams keep their embedding attached and meet in
    *    a SHUFFLE HASH join on scalar (tbl, bucket) keys — embeddings
    *    cross exactly these TWO exchanges, ×tables amplified but
    *    LINEAR in corpus size (pinned by PlanAuditSpec);
    *  - each colliding pair scores AT the join, so no candidate-pair
    *    intermediate ever re-shuffles an embedding — a re-attach-by-id
    *    plan would push the candidate set (the one table that grows
    *    with collision fraction × N × |Q|, dwarfing the corpus) through
    *    an array-carrying exchange;
    *  - pairs colliding in several tables score bit-identically each
    *    time (deterministic f64 expression), so the dedup is a scalar
    *    groupBy max, and the top-k window exchanges scalars only.
    *
    * At corpus-scale |Q| the collision fraction is the cost driver:
    * size `planes` up (buckets = 2^planes per table) so per-bucket
    * populations stay bounded, exactly as a production LSH index does.
    */
  def lshTopKLarge(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 8, planes: Int = 5, dim: Int = 64): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    def banded(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), asDouble(col("embedding")).as(embAs),
        posexplode(GraftFunctions.lshBuckets(col("embedding"), tables, planes, dim))
          .as(Seq("tbl", "bucket")))
    val scored = banded(corpus, "vec_id", "ce")
      .join(banded(queries, "query_id", "qe").hint("shuffle_hash"), Seq("tbl", "bucket"))
      .select(col("query_id"), col("vec_id"),
        nativeCosine(corpus)(col("qe"), col("ce")).as("score"))
      .groupBy("query_id", "vec_id").agg(max("score").as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Semantic dedup (SemDeDup-shaped): assign every vector to its
    * nearest centroid cell, compare pairs ONLY within a cell, and drop
    * the higher id of any pair with cosine ≥ threshold. Survivors keep
    * their cell id. The keep-lowest-id rule makes the result
    * deterministic (the published heuristic — keep the vector farthest
    * from the centroid — is an orthogonal one-line swap of the drop
    * rule).
    *
    * Scale shape: the cell assignment is the zero-shuffle per-row
    * argmin; the ONE exchange co-locates each cell's vectors for the
    * pairwise pass — inherent to within-cluster comparison, and bounded
    * because k is sized so a cell (≈N/k rows) fits a task. That
    * per-cell quadratic is the whole point of clustering first: k grows
    * with the corpus, all-pairs cost stays (N/k)² per cell, never N².
    */
  def semanticDedup(corpus: DataFrame, cents: Centroids, threshold: Double): DataFrame = {
    // Materialized once: the assignment subtree (scan + k-way argmin per
    // row) feeds both self-join sides AND the final anti-join — without
    // this the argmin runs up to 3×. An eager localCheckpoint (not
    // persist) so the blocks are ContextCleaner-collected when the
    // result frame is dropped — a plain persist registers in the
    // session CacheManager and leaks storage across repeated calls
    // (round-4 advice; same class as the round-3 Listing fix).
    // Production materializes the assignment at rest instead
    // (writeIvfIndex's cid-partitioned form); this is the in-session
    // analog, spill-safe at corpus scale (MEMORY_AND_DISK blocks).
    val cells = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("cid", nearestCid(corpus, cents, col("e")))
      .localCheckpoint(true)
    val drops = cells.as("a").join(cells.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(nativeCosine(corpus)(col("a.e"), col("b.e")) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    cells.join(drops, Seq("vec_id"), "left_anti").select("vec_id", "cid")
  }

  /** Embedding near-duplicate pairs: block on the sign-bit string of
    * the first `blockDims` coordinates (identical vectors always
    * collide), verify cosine within blocks. Never all-pairs.
    * Scale: expected block size ≈ N / 2^blockDims for centered data —
    * size blockDims ≈ log2(N) − 8 so blocks stay O(hundreds) as the
    * corpus grows (16 bits ≈ right for ~10M rows; 100 TB wants ~30). */
  /** Cross-set embedding near-dup — SEMANTIC DECONTAMINATION: corpus
    * vectors whose cosine to ANY reference (benchmark/eval-set) vector
    * reaches `threshold`, found through the same sign-block candidate
    * generation as [[nearDupPairs]] but across TWO frames. The n-gram
    * decontamination ([[graft.operators.CorpusOps.decontaminate]])
    * catches verbatim leakage; this catches the paraphrased/translated
    * leakage that survives lexical overlap — the pair is how a
    * training build scrubs eval sets.
    *
    * Scale shape: the reference side is eval-set-sized by contract and
    * BROADCASTS (the decontaminate precedent); the corpus never
    * shuffles — blocking and scoring are scan-side against the
    * broadcast block map, emitting only matched (corpus_id, ref_id,
    * cos) scalars. Sign-blocking is approximate the usual way
    * ([[nearDupRecallReport]] measures the config); the blocked
    * candidate set is deterministic, so the operator is fully
    * oracle-bound. */
  /** Sign-bit block over the first `blockDims` coordinates as a
    * '0'/'1' string. Unrolled concat of codegen'd element_at/when —
    * NOT `array_join(transform(slice(...)))`, whose higher-order
    * function runs interpreted per corpus row (guide §4: prefer
    * built-ins; the asDouble note). Identical output for the
    * fixed-dim embedding contract (dim ≥ blockDims, non-null
    * elements) — the regime every caller is in. */
  private def signBlockBits(e: Column, blockDims: Int): Column =
    concat((1 to blockDims).map(i =>
      when(element_at(e, i) >= 0, "1").otherwise("0")): _*)

  def crossSetNearDup(corpus: DataFrame, reference: DataFrame,
      threshold: Double, blockDims: Int = 16): DataFrame = {
    def blocked(df: DataFrame, idAs: String, embAs: String): DataFrame = {
      val e = asDouble(col("embedding"))
      val block = signBlockBits(e, blockDims)
      df.select(col("vec_id").as(idAs), e.as(embAs), block.as("block"))
    }
    blocked(corpus, "corpus_id", "ce")
      .join(broadcast(blocked(reference, "ref_id", "re")), Seq("block"))
      .select(col("corpus_id"), col("ref_id"),
        nativeCosine(corpus)(col("ce"), col("re")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  def nearDupPairs(corpus: DataFrame, threshold: Double, blockDims: Int = 16): DataFrame = {
    val e = asDouble(col("embedding"))
    val block = signBlockBits(e, blockDims)
    val b = corpus.select(col("vec_id"), e.as("e"), block.as("block"))
    b.as("a").join(b.as("b"),
        col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        nativeCosine(corpus)(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Recall/precision report for the sign-block embedding near-dup
    * path — the eval a semantic-dedup deployment runs BEFORE trusting
    * a block config (the [[graft.multimodal.Multimodal.bandedRecallReport]]
    * analog for the embedding family). Sign-blocking is EXACT for
    * identical vectors and sharply lossy for perturbed ones (a single
    * sign flip among the first `blockDims` coordinates hides the
    * pair), so the measured per-threshold recall of the blocked
    * candidate set against the exact all-pairs cosine baseline is the
    * number that decides between this config, more/fewer block dims,
    * or the multi-probe ANN path. The exact baseline is O(n²) BY
    * DESIGN — an EVAL operator, run over a drawn sample at corpus
    * scale (the ann_recall_report contract). */
  def nearDupRecallReport(corpus: DataFrame,
      thresholds: Seq[Double] = Seq(0.6, 0.7, 0.85, 0.95),
      blockDims: Int = 16): DataFrame = {
    require(thresholds.nonEmpty, "no thresholds to evaluate")
    val spark = corpus.sparkSession
    val th = spark.createDataFrame(
      spark.sparkContext.parallelize(thresholds.map(Tuple1(_)), 1))
      .toDF("threshold")
    val e = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val a = e.select(col("vec_id").as("id_a"), col("e").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("e").as("eb"))
    // all-pairs as a broadcast nested-loop (the eval sample is bounded
    // by contract), never a shuffle cartesian
    val exact = a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(nativeCosine(corpus)(col("ea"), col("eb")).as("score"))
    // threshold -1 = every blocked candidate, one blocking pass
    val cand = nearDupPairs(corpus, threshold = -1.0, blockDims)
      .select(col("cos").as("score"))
    graft.operators.RecallEval.aggregate(th, exact, cand,
      hit = _ >= _, config = Seq("block_dims" -> lit(blockDims)))
  }

  /** Per-source embedding drift report: each source's mean vector
    * (centroid) and the distribution of its members' cosine to it —
    * the domain-shift diagnostic a corpus card tracks (a source whose
    * members scatter away from their own centroid is heterogeneous or
    * drifting; compare snapshots to watch it move). Joins the text
    * table to the embedding table on the shared id space.
    *
    * Shape: the embedding explodes to scalar (source, id, dim, value)
    * rows scan-side; the centroid is a partial+final mean keyed
    * (source, dim) — sources×dims rows, plan-sized, so it BROADCASTS
    * back onto the dim stream; the per-vector cosine reduces to three
    * running sums keyed (source, id). No exchange ever carries an
    * embedding array.
    *
    * Degenerate input: an all-zero vector (or all-zero centroid) has
    * no direction, so its cosine is undefined — such rows are FILTERED
    * (vv > 0 AND cc > 0, mirroring int8QuantizeError's mx > 0 guard)
    * rather than left to non-ANSI division, whose NULL would silently
    * vanish inside avg/min while an IEEE engine said NaN. */
  def sourceDrift(docs: DataFrame, emb: DataFrame): DataFrame = {
    val dims = emb
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .join(docs.select(col("doc_id"), col("source")), col("doc_id") === col("vec_id"))
      .select(col("source"), col("vec_id"), posexplode(col("emb")).as(Seq("dim", "v")))
    val cent = dims.groupBy("source", "dim").agg(avg("v").as("c"))
    val cos = dims.join(broadcast(cent), Seq("source", "dim"))
      .groupBy("source", "vec_id")
      .agg(
        sum(col("v") * col("c")).as("vc"),
        sum(col("v") * col("v")).as("vv"),
        sum(col("c") * col("c")).as("cc"))
      .filter(col("vv") > 0 && col("cc") > 0)
      .select(col("source"), (col("vc") / (sqrt(col("vv")) * sqrt(col("cc")))).as("cos"))
    cos.groupBy("source").agg(
      count(lit(1)).as("n_vecs"),
      round(avg("cos"), 4).as("avg_cos"),
      round(min("cos"), 4).as("min_cos"))
  }

  /** Per-dimension standardization (z-score) of an embedding column —
    * the preprocessing step real vector pipelines run before ANN /
    * clustering so no dimension dominates the metric. Returns
    * (idCol, dim, v_std) in EXPLODED scalar form: the caller
    * re-assembles or aggregates downstream, and nothing array-typed
    * ever crosses an exchange (the sourceDrift shape).
    *
    * Stats are a (dims)-sized aggregate — plan-sized, broadcast back
    * onto the dim stream. Population std (the normalizing constant,
    * not an estimator); zero-variance dims standardize to 0 rather
    * than dividing by zero (the constant carries no signal). Values
    * round to 6 dp so both engines' f64 agree bit-exactly. */
  def standardizeDims(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val dims = df.select(col(idCol),
      posexplode(asDouble(col(embCol))).as(Seq("dim", "v")))
    val stats = dims.groupBy("dim").agg(
      avg("v").as("mu"),
      // population variance via the moment form, f64 exact expression
      // order shared with the oracle
      (avg(col("v") * col("v")) - avg("v") * avg("v")).as("var"))
    dims.join(broadcast(stats), "dim")
      .select(col(idCol), col("dim"),
        round(when(col("var") > 0,
          (col("v") - col("mu")) / sqrt(col("var"))).otherwise(0.0), 6).as("v_std"))
  }

  /** Symmetric int8 quantization error report: per-vector scale
    * (max |v| / 127) and the mean/max absolute reconstruction error of
    * `q = floor(v·127/mx + 0.5)` — the storage-scale decision input
    * (int8 cuts an embedding store 4× vs f32; the report says what that
    * costs in fidelity per vector). floor(+0.5) rather than round()
    * keeps the quantized values bit-identical across engines. All-zero
    * vectors have no scale and are excluded.
    *
    * Shape: per-element errors go through explode + a codegen'd
    * aggregate rather than `aggregate`/`array_max` HOFs — the mean and
    * max would otherwise re-evaluate the interpreted error transform
    * once per consumer (the diamond the dedup kernels eliminated). The
    * one exchange carries scalar (id, mx, err) rows, map-side combined.
    */
  def int8QuantizeError(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val e = asDouble(col(embCol))
    df.select(col(idCol), e.as("emb"))
      // max |v| = max(max(v), -min(v)) — two codegen'd array extrema
      // instead of an interpreted per-element abs transform (guide §4:
      // prefer built-ins; identical value for any non-empty numeric
      // array, and embeddings are fixed-dim non-null by contract)
      .withColumn("mx", greatest(array_max(col("emb")), -array_min(col("emb"))))
      .filter(col("mx") > 0)
      .select(col(idCol), col("mx"), explode(col("emb")).as("v"))
      .withColumn("err",
        abs(col("v") - floor(col("v") * lit(127.0) / col("mx") + lit(0.5)) * col("mx") / lit(127.0)))
      .groupBy(idCol)
      .agg(
        round(first(col("mx")), 6).as("max_abs"),
        round(avg(col("err")), 6).as("mean_err"),
        round(max(col("err")), 6).as("max_err"))
  }
}
