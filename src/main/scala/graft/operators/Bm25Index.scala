package graft.operators

import graft.store.{AtomicPublisher, CdcStream, CommitLog, RenameOrLinkPublisher}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 as an AT-REST index — the production shape of
  * [[CorpusOps.bm25TopK]], which recomputes tf/df/dl from raw text on
  * every call (at 100 TB every probe batch would pay a full corpus
  * tokenization). Here the lexical statistics live in LOGGED tables
  * maintained incrementally off the corpus table's change feed (the
  * [[graft.sim.IvfRefresh.drainIntoLoggedIndex]] precedent), and a
  * probe touches ONLY the postings of its query terms:
  *
  *  - `postings` (doc, term, tf, dl): one row per distinct (doc, term),
  *    with the document length DENORMALIZED onto each row — a long
  *    column that run-length compresses to nothing in doc-ordered
  *    parquet and saves the probe a doc-keyed join against a second
  *    corpus-sized table.
  *  - `doclens` (doc, dl): one row per document — including EMPTY
  *    documents, which carry no postings but still count in N and
  *    weigh avgdl down (the textbook denominator). Doc-count-sized,
  *    orders of magnitude smaller than the text.
  *
  * There is deliberately NO stored (term, df) table: df(t) is exactly
  * the number of postings rows for `t`, and the probe reads those rows
  * anyway for their tf — so df is a query-term-sized aggregate over
  * the same pruned scan. A stored df would be a second
  * merge-maintained aggregate (per-term counters cannot ride the
  * keyed-by-doc retraction path) bringing zero read savings.
  *
  * Both tables are keyed by the doc id, so source DELETEs and merge
  * updates retract a document's postings row-for-row through the
  * standard keyed drain — a bare parquet-append index cannot do that.
  * Exactly-once rides the sink's `consumed=` ledger: a crash mid-drain
  * resumes without double-counting a document (Bm25IndexSpec injects
  * one).
  */
object Bm25Index {

  def postingsSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("term", StringType),
    StructField("tf", LongType),
    StructField("dl", LongType),
    // 1-based positions of the term among the document's NON-EMPTY
    // tokens (sorted) — the phrase/proximity signal. Delta-encoded
    // ints in parquet; column-pruned away by the plain BM25 probe, so
    // tf/df scoring never pays for it.
    StructField("positions", ArrayType(LongType))))

  def docLensSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("dl", LongType)))

  /** Non-empty token count of one document — the `dl` every BM25
    * variant shares ([[CorpusOps.bm25TopK]]'s sum-of-tf equals this by
    * construction). */
  private def dlExpr(text: Column): Column =
    size(filter(graft.text.TextOps.tokens(text), _ =!= lit(""))).cast("long")

  /** Increment transform for the postings table: tokenize the arriving
    * documents, aggregate tf per (doc, term) WITHIN the increment, and
    * denormalize dl onto each row. Increment-sized throughout; the id
    * column rides through unchanged on every row (IncrementalView's
    * keyed contract), so a retracted document drops all its postings. */
  private[graft] def postingsTransform(idCol: String, textCol: String)(
      d: DataFrame): DataFrame = {
    // positions index the FILTERED (non-empty) token sequence, 1-based
    // — the same sequence dl counts, so position ≤ dl by construction
    val tok = d.select(col(idCol),
        posexplode(filter(graft.text.TextOps.tokens(col(textCol)),
          _ =!= lit(""))).as(Seq("pos", "term")))
      .select(col(idCol), col("term"), (col("pos") + 1).cast("long").as("p"))
    val tf = tok.groupBy(idCol, "term")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list("p")).as("positions"))
    tf.join(d.select(col(idCol), dlExpr(col(textCol)).as("dl")), idCol)
      .select(col(idCol), col("term"), col("tf"), col("dl"), col("positions"))
  }

  private[graft] def docLensTransform(idCol: String, textCol: String)(
      d: DataFrame): DataFrame =
    d.select(col(idCol), dlExpr(col(textCol)).as("dl"))

  /** Drain the corpus table's change feed into both index tables.
    * Two keyed consumers over one feed — each sink carries its own
    * `consumed=` ledger, so they advance independently and a crash in
    * either resumes exactly-once. `afterBatch` fires per postings
    * batch (the crash-injection seam, as in drainIntoLoggedIndex). */
  def drainIntoIndex(spark: SparkSession, srcTable: String,
      srcSchema: StructType, postingsTable: String, docLensTable: String,
      idCol: String, textCol: String,
      maxVersionsPerBatch: Long = 10L,
      publisher: AtomicPublisher = RenameOrLinkPublisher,
      afterBatch: (Long, Long) => Unit = (_, _) => ()): CdcStream.Drained = {
    val p = CdcStream.drain(spark, srcTable, srcSchema, postingsTable,
      postingsTransform(idCol, textCol), keyCols = Some(Seq(idCol)),
      maxVersionsPerBatch = maxVersionsPerBatch,
      publisher = publisher, afterBatch = afterBatch)
    CdcStream.drain(spark, srcTable, srcSchema, docLensTable,
      docLensTransform(idCol, textCol), keyCols = Some(Seq(idCol)),
      maxVersionsPerBatch = maxVersionsPerBatch, publisher = publisher)
    p
  }

  /** ONE change-feed micro-batch applied to BOTH index tables
    * EXACTLY-ONCE — the `foreachBatch` bridge for the standard
    * streaming consumer (`spark.readStream.format("graftlog")` over
    * the corpus table). Each sink fences on its own `txn=` ledger, so
    * a crash BETWEEN the two applies resumes cleanly: the replayed
    * batch finds the postings ledger already at `batchId` (aborts,
    * no double-count) and the doclens apply — the one that never
    * landed — goes through. */
  def applyIndexChangesOnce(spark: SparkSession, postingsTable: String,
      docLensTable: String, idCol: String, textCol: String,
      batch: DataFrame, queryId: String, batchId: Long): Unit = {
    CdcStream.applyChangesOnce(spark, postingsTable, postingsSchema(idCol),
      Seq(idCol), batch, queryId, batchId, postingsTransform(idCol, textCol))
    CdcStream.applyChangesOnce(spark, docLensTable, docLensSchema(idCol),
      Seq(idCol), batch, queryId, batchId, docLensTransform(idCol, textCol))
    ()
  }

  /** The (postings, doclens) sink versions carrying the same consumed
    * SOURCE version — min of the two ledger heads, located in each
    * ledger by binary search. Captured once, up front: the probe reads
    * both tables `asOf` these, so a drain advancing either table
    * between ledger read and scan cannot tear the snapshot either. */
  private[operators] def alignedVersions(spark: SparkSession,
      postingsTable: String, docLensTable: String,
      txnQueryId: Option[String] = None): (Long, Long) = {
    // the ledger both tables advance on: consumed= for drainIntoIndex
    // consumers, txn=<queryId> for streaming applyIndexChangesOnce
    // consumers (the caller knows which maintains its index)
    val fold: (String, Long) => Long = txnQueryId match {
      case Some(qid) => (t, v) => CommitLog.lastTxnBatch(spark, t, qid, asOf = v)
      case None => (t, v) => CommitLog.lastConsumed(spark, t, asOf = v)
    }
    val pin: (String, Long) => Long = txnQueryId match {
      case Some(qid) =>
        (t, target) => CommitLog.versionAtTxnBatch(spark, t, qid, target,
          upTo = CommitLog.latestVersion(spark, t))
      case None =>
        (t, target) => CommitLog.versionAtConsumed(spark, t, target,
          upTo = CommitLog.latestVersion(spark, t))
    }
    val pv = CommitLog.latestVersion(spark, postingsTable)
    val dv = CommitLog.latestVersion(spark, docLensTable)
    val pc = fold(postingsTable, pv)
    val dc = fold(docLensTable, dv)
    if (pc == dc) return (pv, dv)
    val target = math.min(pc, dc)
    def pinChecked(table: String, head: Long, headFold: Long): Long = {
      if (headFold == target) return head
      val v = pin(table, target)
      val got = fold(table, v)
      require(got == target,
        s"BM25 index tables cannot align: $table has no snapshot at " +
          s"${txnQueryId.fold("consumed source version")(q => s"txn $q batch")} " +
          s"$target (nearest below: $got at sink version $v) — postings " +
          s"at $pc, doclens at $dc advanced with different batch " +
          "boundaries (or a checkpoint pruned the granular ledger); " +
          "re-drain both and probe again")
      v
    }
    (pinChecked(postingsTable, pv, pc), pinChecked(docLensTable, dv, dc))
  }

  /** BM25 top-k against the at-rest index — identical scoring, ranking
    * and tie-breaks to [[CorpusOps.bm25TopK]] (the shared oracle SQL
    * pins result equivalence), but the corpus-sized work is GONE:
    *
    *  - the query-term set becomes a LITERAL `isin` predicate on the
    *    postings scan (collected driver-side — query terms are request
    *    metadata, bounded by the probe batch, the exact
    *    [[graft.sim.Similarity.ivfTopKFromIndex]] probed-cells
    *    contract), so parquet pushdown skips row groups and, after a
    *    `compact(clusterBy = "term")`, the log's range stats prune
    *    whole files before a byte is read (Bm25IndexSpec pins the
    *    file count);
    *  - df is a partial+final aggregate over a second, identically
    *    pruned and column-pruned scan, broadcast back query-term-sized
    *    — never a per-term co-location of a hot term's postings;
    *  - N and avgdl are two scalar aggregates over the doc-count-sized
    *    doclens table, one broadcast row.
    *
    * The postings never shuffle at all: every join against them is a
    * broadcast, and the only exchange in the plan is the per-query
    * top-k window over (query_id, doc, score) scalars.
    *
    * TORN-WINDOW SAFETY: the two index tables advance on independent
    * `consumed=` ledgers ([[drainIntoIndex]] applies postings, then
    * doclens), so "read both at latest" between the two applies would
    * score documents postings carries but doclens hasn't counted —
    * stale N/avgdl, inconsistently-weighted new hits. Both reads
    * therefore pin to the sink versions carrying the MIN ALIGNED
    * consumed source version (binary search over each ledger,
    * [[CommitLog.versionAtConsumed]]); a mid-drain probe sees the last
    * fully-applied source version on both tables, never a torn mix. A
    * ledger pair that cannot align exactly (different
    * `maxVersionsPerBatch` drains landing on disjoint batch
    * boundaries) fails loud. Streaming-maintained indexes
    * ([[applyIndexChangesOnce]]) fence on `txn=` ledgers instead —
    * pass that consumer's query id as `txnQueryId` and the SAME
    * alignment pins both reads to the last fully-applied BATCH (a
    * probe racing the gap between the two applies sees the pre-batch
    * snapshot); without it, consumed is 0 on both sides, alignment is
    * a no-op, and the probe-after-the-batch pattern applies (the
    * foreachBatch caller owns the probe schedule). */
  def bm25TopKFromIndex(spark: SparkSession, postingsTable: String,
      docLensTable: String, idCol: String, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxProbeTerms: Int = 16384,
      txnQueryId: Option[String] = None): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params: k1=$k1 b=$b")
    val (postAsOf, lensAsOf) =
      alignedVersions(spark, postingsTable, docLensTable, txnQueryId)
    val qterms = queries
      .select(col("query_id"),
        explode(graft.text.TextOps.tokens(col("query_text"))).as("term"))
      .filter(col("term") =!= "").distinct()
    // the queried terms as a LITERAL predicate (driver-side, probe-
    // batch-sized): a semi-join restriction would read every postings
    // file — a literal isin reaches the scan, so row groups skip by
    // footer stats and term-clustered files prune from the log alone
    val terms = qterms.select("term").distinct()
      .collect().map(_.getString(0)).toSeq
    // the literal-predicate contract, enforced: each term lands in
    // every file's row-group filter, so an unbounded batch builds an
    // unbounded expression tree evaluated per file
    require(terms.size <= maxProbeTerms,
      s"${terms.size} distinct query terms exceed the probe-batch bound " +
        s"$maxProbeTerms — the term set becomes a literal isin predicate " +
        "on the postings scan (that is what makes probing file pruning); " +
        "split the query batch and union the results, or raise " +
        "maxProbeTerms knowingly")
    val post = spark.read.format("graftlog")
      .option("versionAsOf", postAsOf.toString).load(postingsTable)
      .filter(col("term").isin(terms: _*))
      .select(col(idCol), col("term"), col("tf"), col("dl"))
    // df(t) = |postings rows of t| — a partial+final aggregate over the
    // pruned scan (map-side combine; the final side is ≤ |query terms|
    // rows) broadcast back, NOT a per-term window: a window would
    // co-locate every posting of a hot term ("the") in ONE task — the
    // exact skew bomb a stopword's postings list is. The second scan
    // this costs is pruned identically and column-pruned to `term`.
    val dfQ = post.groupBy("term").agg(count(lit(1)).as("df"))
    val lens = CommitLog.read(spark, docLensTable, docLensSchema(idCol),
      asOf = lensAsOf)
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
        coalesce(sum("dl"), lit(0L)).cast("double").as("total_tok"))
      .select(col("n_docs"), (col("total_tok") / col("n_docs")).as("avgdl"))
    val scored = post
      .join(broadcast(qterms), "term")
      .join(broadcast(dfQ), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol),
        CorpusOps.bm25ScoreCol(k1, b).as("s"))
    CorpusOps.rankBm25(scored, idCol, k, positives = None)
  }

  /** PHRASE top-k against the positional postings — the standard
    * second-stage lexical signal BM25's bag-of-words cannot express
    * ("data selection" ≠ documents containing both words somewhere).
    * A document matches at anchor position `a` when every phrase term
    * `t_o` (0-based offset `o`) has a posting position `a + o`; the
    * score is the number of complete anchors (overlapping occurrences
    * each count — "x x x" holds two "x x"), ranked descending, ties by
    * doc id. Duplicate terms in the phrase are distinct offsets, so the
    * completeness test counts DISTINCT matched offsets per anchor.
    *
    * Scale shape — the same pruned probe as [[bm25TopKFromIndex]]: the
    * phrase terms become a literal `isin` on the postings scan (row
    * groups skip, term-clustered files prune), positions explode only
    * for queried terms (linear in their corpus occurrences — inherent
    * to phrase search), and everything past the explode is scalar
    * (query_id, doc, offset, anchor) rows through two keyed
    * aggregates and the per-query top-k window. Single-table probe —
    * doclens isn't read, so there is no torn-window pair to align. */
  def phraseTopKFromIndex(spark: SparkSession, postingsTable: String,
      idCol: String, phrases: DataFrame, k: Int,
      maxProbeTerms: Int = 16384): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val q = phrases.select(col("query_id"),
        posexplode(filter(graft.text.TextOps.tokens(col("query_text")),
          _ =!= lit(""))).as(Seq("off", "term")))
      .select(col("query_id"), col("off").cast("long").as("off"), col("term"))
    val qlen = q.groupBy("query_id").agg(count(lit(1)).as("phrase_len"))
    val terms = q.select("term").distinct()
      .collect().map(_.getString(0)).toSeq
    require(terms.size <= maxProbeTerms,
      s"${terms.size} distinct phrase terms exceed the probe-batch bound " +
        s"$maxProbeTerms — split the query batch and union the results, " +
        "or raise maxProbeTerms knowingly")
    val post = spark.read.format("graftlog").load(postingsTable)
      .filter(col("term").isin(terms: _*))
      .select(col(idCol), col("term"), col("positions"))
    val anchors = post.join(broadcast(q), "term")
      .select(col("query_id"), col(idCol), col("off"),
        explode(col("positions")).as("p"))
      .select(col("query_id"), col(idCol), col("off"),
        (col("p") - col("off")).as("anchor"))
      .filter(col("anchor") >= 1)
      .groupBy("query_id", idCol, "anchor")
      .agg(countDistinct("off").as("hit"))
    val counts = anchors.join(broadcast(qlen), "query_id")
      .filter(col("hit") === col("phrase_len"))
      .groupBy("query_id", idCol).agg(count(lit(1)).as("phrase_count"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("phrase_count").desc, col(idCol))
    counts.withColumn("doc_rank", row_number().over(w).cast("long"))
      .filter(col("doc_rank") <= k)
      .select(col("query_id"), col("doc_rank"), col(idCol), col("phrase_count"))
  }
}
