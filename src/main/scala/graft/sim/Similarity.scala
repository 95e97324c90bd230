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

  /** Element-wise cast to double — all scoring happens in f64. */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Reference (interpreted) form — kept for the equivalence spec;
    * the operators below use the codegen'd native expression. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Codegen'd cosine (graft.functions.CosineSimilarity), registered
    * idempotently on the frame's session. Bit-identical to `cosine`
    * (both accumulate left-to-right in f64). */
  private def nativeCosine(df: DataFrame)(a: Column, b: Column): Column = {
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

  /** IVF top-k. Centroids = the FIRST `numCentroids` vectors by id (a
    * stand-in for k-means — the index structure, not the training, is
    * what's under test). The centroid count is FIXED, not a fraction of
    * the corpus: the centroid set is broadcast, and a corpus-
    * proportional selection (e.g. every 50th vector) would grow
    * unboundedly with data volume and break the broadcast at scale —
    * real IVF indexes likewise pick k by memory/recall budget, not
    * corpus size. Each corpus vector is assigned to its nearest
    * centroid; each query probes the `nProbe` nearest cells and ranks
    * only their members. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int = 10, nProbe: Int = 3): DataFrame = {
    val emb = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
    // first numCentroids by id — orderBy+limit (TakeOrdered, bounded by
    // numCentroids rows) so sparse or offset id spaces still yield
    // exactly numCentroids centroids
    val cent = emb.orderBy("vec_id").limit(numCentroids)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    val sim = nativeCosine(corpus) _
    val bySim = row_number().over(
      Window.partitionBy("vec_id").orderBy(sim(col("e"), col("ce")).desc, col("cid")))
    val assign = emb.crossJoin(broadcast(cent))
      .withColumn("rn", bySim).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qe"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(sim(col("qe"), col("ce")).desc, col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("cid"))
    val candidates = probes.join(assign, "cid").select(col("qid"), col("vec_id"))
    val scored = candidates
      .join(q, "qid")
      .join(emb, "vec_id")
      .select(col("qid").as("query_id"), col("vec_id"),
        sim(col("qe"), col("e")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
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
    * recall is checked against bruteForceTopK in SimilaritySpec.
    * Defaults (8 tables × 5 planes = 32 buckets/table) are tuned for
    * near-orthogonal random embeddings where true neighbors sit at low
    * cosine: candidate sets ~25% of the corpus per query. Clustered
    * real-world embeddings tolerate more planes/fewer tables. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 8, planes: Int = 5, dim: Int = 64): DataFrame = {
    def withBuckets(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val e = asDouble(col("embedding"))
      df.select(col("vec_id").as(idAs), e.as(vecAs),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), lshBucket(e, t, planes, dim).as("bucket"))): _*)).as("tb"))
        .select(col(idAs), col(vecAs), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    }
    val qb = withBuckets(queries, "query_id", "qe")
    val cb = withBuckets(corpus, "vec_id", "ce")
    val candidates = qb.join(cb, Seq("tbl", "bucket"))
      .select(col("query_id"), col("qe"), col("vec_id"), col("ce"))
      .dropDuplicates("query_id", "vec_id")
    val scored = candidates
      .select(col("query_id"), col("vec_id"),
        nativeCosine(corpus)(col("qe"), col("ce")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Embedding near-duplicate pairs: block on the sign-bit string of
    * the first `blockDims` coordinates (identical vectors always
    * collide), verify cosine within blocks. Never all-pairs.
    * Scale: expected block size ≈ N / 2^blockDims for centered data —
    * size blockDims ≈ log2(N) − 8 so blocks stay O(hundreds) as the
    * corpus grows (16 bits ≈ right for ~10M rows; 100 TB wants ~30). */
  def nearDupPairs(corpus: DataFrame, threshold: Double, blockDims: Int = 16): DataFrame = {
    val e = asDouble(col("embedding"))
    val block = array_join(
      transform(slice(e, 1, blockDims), x => when(x >= 0, "1").otherwise("0")), "")
    val b = corpus.select(col("vec_id"), e.as("e"), block.as("block"))
    b.as("a").join(b.as("b"),
        col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        nativeCosine(corpus)(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
