package graft.operators

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline needs between
  * curation and the trainer: packing documents into fixed-token-budget
  * sequences and deterministic stratified downsampling.
  *
  * Both are designed so the SAME input always yields the SAME output
  * regardless of cluster size or partitioning — reproducibility is a
  * correctness property for training-data builds, so nothing here may
  * depend on row arrival order, task scheduling, or RNG state.
  */
object CorpusOps {

  /** Concat-and-chunk sequence packing, the standard pretraining
    * tokenization layout: within a shard, documents are concatenated in
    * id order and the token stream is cut every `budgetTokens`; a
    * document belongs to the chunk where it STARTS (its tail may spill
    * into the next chunk — the trainer reads contiguous chunks, so no
    * tokens are lost, and no per-sequence bin-packing search is needed).
    *
    * Scale shape: the only exchange is a hash partition by `shardCol`,
    * and the running-sum window sorts each shard independently — there
    * is NO global sort. Shard count is the caller's output-shard count
    * (thousands in production, so one window partition ≈ one output
    * file's worth of rows, bounded regardless of corpus size).
    *
    * Emits `start_tok` (token offset of the document within its shard's
    * stream) and `seq` (chunk index = start_tok / budgetTokens).
    *
    * PRECONDITION: `idCol` must be unique within a shard — the window's
    * row frame breaks id ties by arrival order, which would make
    * start_tok/seq retry-dependent and violate the reproducibility
    * contract above. Ids are document keys in every caller, so this is
    * a documentation constraint, not a runtime scan.
    */
  def packConcatChunk(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      shardCol: String,
      budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("start_tok", sum(col(tokCol)).over(w) - col(tokCol))
      .withColumn("seq", floor(col("start_tok") / budgetTokens).cast("long"))
  }

  /** Benchmark decontamination: (corpus doc, benchmark doc) pairs that
    * share at least one word n-gram, with the count of distinct shared
    * n-grams — the standard overlap test run before training so eval
    * examples leaking into the corpus are caught (13-gram in published
    * pipelines; n is a parameter here).
    *
    * Scale shape: the benchmark side is an EVAL SET — thousands of
    * docs, not corpus-scale — so its exploded n-gram set is broadcast
    * and the corpus streams past it map-side; the only exchange is the
    * final groupBy on scalar (doc_id, bench_id) pairs, bounded by the
    * contamination hits, not the corpus.
    */
  def contaminationPairs(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      benchIdCol: String,
      textCol: String,
      n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // Native shingle kernel (graft_word_shingles ≡ Dedup.wordShingles,
    // TextExpressionsSpec-pinned): the interpreted HOF walk cost 8 s
    // on the 2-task fixture scan at sf0.1; the kernel pass is ~150 ms
    // on the same scan, so no spread repartition is needed — which
    // preserves the PlanAuditSpec pin that NO exchange ever carries
    // corpus text (the property that matters at 100 TB).
    def shingled(df: DataFrame, id: String, as: String) =
      df.select(col(id).as(as),
        explode(graft.functions.GraftFunctions.wordShingles(col(textCol), n)).as("sh"))
    shingled(corpus, idCol, idCol)
      .join(broadcast(shingled(bench, benchIdCol, benchIdCol)), "sh")
      // wordShingles is per-doc distinct, so count(*) counts DISTINCT
      // shared n-grams
      .groupBy(idCol, benchIdCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-stratum integer keep percentages that rebalance a corpus
    * toward `targetWeights` by DOWNSAMPLING ONLY (no duplication): the
    * largest total satisfying every target share is bounded by the
    * scarcest stratum (min over counts/weight); every other stratum is
    * cut to its share of that total. Strata without a positive target
    * weight are dropped (rate 0). Rates floor to integer percent so the
    * cut composes with `stratumKeep`'s md5-bucket predicate — the
    * whole decision stays deterministic and rerun-stable.
    *
    * This is the data-mixing step of a training build (e.g. DoReMi-style
    * domain weights applied to a crawl): `counts` is an index-sized
    * per-stratum aggregate (one tiny groupBy, collected driver-side —
    * never row data), the returned map rides into the per-row predicate
    * as a literal CASE chain.
    *
    * All arithmetic is f64 with a fixed evaluation order
    * (`100.0 * tmax * w / c`, left-associative) so an external oracle
    * computing the same expression reproduces the rates bit-exactly.
    */
  def mixRates(
      counts: Map[String, Long],
      targetWeights: Map[String, Double]): Map[String, Int] = {
    require(targetWeights.values.forall(_ >= 0), s"negative target weight: $targetWeights")
    val feasible = counts.collect {
      case (s, c) if targetWeights.getOrElse(s, 0.0) > 0 => c / targetWeights(s)
    }
    require(feasible.nonEmpty, "no stratum has a positive target weight")
    val tmax = feasible.min
    counts.map { case (s, c) =>
      val w = targetWeights.getOrElse(s, 0.0)
      s -> (if (w <= 0) 0
            else math.min(math.floor(100.0 * tmax * w / c).toInt, 100))
    }
  }

  /** Epochs-per-source upsampling rates: the COMPLEMENT of mixRates'
    * downsample-only plan. Where mixRates shrinks abundant strata to
    * hit target weights, repeatRates REPEATS scarce ones — the
    * "code × 4 epochs, web × 1" knob real training mixes turn. The
    * scale anchors at the most-abundant-relative-to-target stratum
    * (repeat rate exactly 1.0 — nothing is downsampled), and every
    * other stratum's rate rises to hit the weights. Rates are in
    * hundredths (250 = 2.5 epochs) so the fractional part stays
    * integer-deterministic. Zero-weight strata drop to 0. */
  def repeatRates(
      counts: Map[String, Long],
      targetWeights: Map[String, Double]): Map[String, Int] = {
    require(targetWeights.values.forall(_ >= 0), s"negative target weight: $targetWeights")
    val anchored = counts.collect {
      case (s, c) if targetWeights.getOrElse(s, 0.0) > 0 => c / targetWeights(s)
    }
    require(anchored.nonEmpty, "no stratum has a positive target weight")
    val tmin = anchored.max // the stratum already at/above its share
    counts.map { case (s, c) =>
      val w = targetWeights.getOrElse(s, 0.0)
      // floor in the same f64 expression order as the oracle — the
      // mixRates boundary discipline
      s -> (if (w <= 0) 0 else math.floor(100.0 * tmin * w / c).toInt)
    }
  }

  /** Apply repeat rates: each document emits floor(rate) copies plus
    * one more when its md5 bucket (0..99 from the id) falls below the
    * fractional hundredths — deterministic under rerun and retry like
    * every sampling decision here (no RNG), and a stable superset as a
    * rate rises. Output adds a `copy` index (0-based) so downstream
    * packing/shuffling sees distinct rows. Scan-side explode of a
    * bounded per-row count — no exchange. */
  def upsampleByRate(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      ratesHundredths: Map[String, Int]): DataFrame = {
    require(ratesHundredths.values.forall(r => r >= 0 && r <= 10000),
      s"rates must be hundredths in 0..10000 (≤ 100 epochs): $ratesHundredths")
    val rate = ratesHundredths.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, v).otherwise(acc)
    }
    val extra = when(Hashing.md5Bucket(col(idCol), 100) < rate % 100, 1).otherwise(0)
    val copies = (rate / 100).cast("int") + extra
    // explode(null) emits no rows — a zero-copy doc drops entirely
    // (sequence(0, -1) would wrongly DESCEND, not empty out)
    df.withColumn("copy",
        explode(when(copies > 0, sequence(lit(0), copies - 1))))
      .withColumn("copy", col("copy").cast("long"))
  }

  /** Token-budget selection: within each stratum, keep documents in
    * `orderCol`-descending order (ties broken by `idCol`) while the
    * RUNNING token total stays within `budgetTokens` — the "best
    * documents up to N tokens per source" step of a data-mixing plan
    * (a budget is how mixes are actually specified: token counts, not
    * document counts).
    *
    * Scale shape: one hash exchange on `strataCol`, then an
    * independent per-stratum window — no global sort.
    *
    * STRATUM-CARDINALITY CONTRACT: the running total is order-defined
    * WITHIN a stratum, so each stratum's cumulative sum is one window
    * partition = ONE task sorting that stratum's rows. Strata here are
    * mixing-plan sources/domains — tens to thousands, each a corpus
    * FRACTION — so parallelism is the stratum count and the per-task
    * row count is N/|strata|; a single giant stratum (one source
    * holding most of 100 TB) serializes through one task. That is
    * inherent to an EXACT prefix-sum cut on an unsharded key: a
    * two-phase cumsum (per-shard partials + broadcast offsets) needs
    * ORDER-ALIGNED shards, i.e. a range partition on (orderCol, id),
    * which costs a sampling pass and a full range shuffle — not worth
    * it below extreme skew. For that regime, pre-split the stratum
    * (`packLengthBucketed`'s md5-shard pattern) and give each shard
    * its own budget, or cut by threshold instead: the quantile-bracket
    * machinery of [[dsirSelectThreshold]] applies verbatim with
    * token-weighted counts. Rows-unbounded-preceding over SCALAR
    * (order, id, tok) columns keeps even a 10⁹-row stratum's task
    * streaming, not resident.
    */
  def selectToTokenBudget(
      df: DataFrame,
      strataCol: String,
      orderCol: String,
      idCol: String,
      tokCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val w = Window.partitionBy(strataCol).orderBy(col(orderCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tok", sum(col(tokCol)).over(w))
      .filter(col("cum_tok") <= budgetTokens)
  }

  /** Per-document top-`k` terms by tf-idf (keyword extraction — the
    * standard corpus-card / topic-drift report, and the feature input
    * of cheap relevance filters). tf = term occurrences in the doc,
    * idf = ln(N / df) with df = documents containing the term; scores
    * are rounded to 6 dp BEFORE ranking so the top-k cut is
    * reproducible across engines (ties after rounding break on the
    * term string), then ranked per document.
    *
    * Scale shape: the token explode is scan-side; tf is a partial+final
    * aggregate keyed (doc, term); df aggregates tf down to VOCAB size,
    * so it broadcasts (as does the 1-row corpus count), and the only
    * other exchange is the per-document ranking window — keyed by doc
    * id, never a global sort.
    */
  def tfIdfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tok = docs
      .select(col(idCol), explode(graft.text.TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= k)
  }

  /** BM25 top-k document retrieval — the standard lexical ranking
    * function (Robertson/Sparck-Jones; the Lucene default scoring),
    * and the retrieval half of dataset curation jobs like "pull the
    * strongest matches for these probe queries out of the corpus"
    * (contamination triage, topic audits, eval-set sourcing).
    *
    * score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the
    * non-negative Lucene variant. Query terms are DEDUPLICATED (set
    * semantics, the common implementation choice); per-pair scores are
    * rounded to 6 dp BEFORE ranking so the top-k cut is reproducible
    * across engines, rounding-ties broken by doc id.
    *
    * Scale shape — an inverted-index probe, never a corpus×queries
    * product: tf is a partial+final aggregate keyed (doc, term); the
    * BROADCAST query-term set hash-joins against it, so only the
    * postings of queried terms survive to scoring; df is SEMI-JOINED
    * to the query-term set before broadcasting, so its broadcast is
    * query-sized, never vocab-sized (a web corpus's distinct-token
    * count — typo/URL noise — can exceed the broadcast ceiling);
    * corpus stats are one broadcast row, dl joins doc-keyed, and the
    * only remaining exchange is the per-query top-k window.
    * Everything after the scan carries scalars.
    *
    * `queries` must expose (query_id, query_text); tokenization is the
    * engine-wide whitespace contract ([[graft.text.TextOps.tokens]]).
    *
    * `positives` optionally supplies known gold (query_id, positive_id)
    * pairs excluded BEFORE the rank cut — the BM25-negatives recipe
    * (the classic lexical hard-negative source for retriever training:
    * top BM25 hits that are NOT the gold passage). Exclusion after the
    * cut would burn slots instead of freeing them. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      positives: Option[DataFrame] = None): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params: k1=$k1 b=$b")
    val tok = docs
      .select(col(idCol), explode(graft.text.TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N counts ALL documents (an empty doc is still a document); avgdl
    // = total tokens / N, so empty docs weigh the average down exactly
    // as the textbook definition says
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      .crossJoin(tok.agg(count(lit(1)).cast("double").as("total_tok")))
      .select(col("n_docs"), (col("total_tok") / col("n_docs")).as("avgdl"))
    val qterms = queries
      .select(col("query_id"),
        explode(graft.text.TextOps.tokens(col("query_text"))).as("term"))
      .filter(col("term") =!= "").distinct()
    // df restricted to QUERIED terms before the broadcast — the full
    // df is vocab-sized (unboundedly noisy on web text); the semi-join
    // keys on the already-tiny query-term set, so what broadcasts is
    // |distinct query terms| rows
    val dfQueried = df.join(broadcast(qterms.select("term").distinct()),
      Seq("term"), "left_semi")
    val scored = tf
      .join(broadcast(qterms), "term") // postings of queried terms only
      .join(broadcast(dfQueried), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol), bm25ScoreCol(k1, b).as("s"))
    rankBm25(scored, idCol, k, positives)
  }

  /** The ONE rendering of the per-(query, doc, term) BM25 score —
    * shared by the from-scratch probes (serving-sized and
    * corpus-scale) and [[Bm25Index.bm25TopKFromIndex]], so the scoring
    * math cannot drift between the recompute and the index. Expects
    * tf/df/dl/n_docs/avgdl in scope. */
  private[operators] def bm25ScoreCol(k1: Double, b: Double): Column =
    log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
      (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))

  /** Shared BM25 ranking tail: 6-dp sum per (query, doc), optional
    * gold anti-join PRE-cut, per-query top-k window over scalars. */
  private[operators] def rankBm25(scored: DataFrame, idCol: String, k: Int,
      positives: Option[DataFrame]): DataFrame = {
    val agg = scored.groupBy("query_id", idCol)
      .agg(round(sum("s"), 6).as("bm25"))
    // gold exclusion on scalar (query_id, id) pairs, pre-cut
    val excl = positives.fold(agg) { p =>
      agg.join(p.select(col("query_id"), col("positive_id").as(idCol)),
        Seq("query_id", idCol), "left_anti")
    }
    val w = Window.partitionBy("query_id").orderBy(col("bm25").desc, col(idCol))
    excl.withColumn("doc_rank", row_number().over(w).cast("long"))
      .filter(col("doc_rank") <= k)
      .select(col("query_id"), col("doc_rank"), col(idCol), col("bm25"))
  }

  /** [[bm25TopK]] for CORPUS-SCALE query batches (|Q| ≈ N — the
    * lexical-mining sweep shape: every training query retrieves its
    * BM25 candidates), where the serving-sized plan's two broadcasts
    * break: the query-term table is |Q|-sized and the distinct query
    * vocabulary approaches the corpus vocabulary, so nothing
    * query-derived fits an executor broadcast. Both meet the postings
    * in SHUFFLE-HASH joins on the scalar `term` key instead (the
    * [[graft.sim.Similarity.ivfTopKLarge]] pattern on the inverted
    * index), and scoring happens AT the join so only (query_id, doc,
    * score) scalars flow downstream.
    *
    * `maxDf` is the HOT-TERM bound that makes the sweep honest: a
    * stopword's postings list times its query occurrences is a
    * quadratic per-term blowup no shuffle can absorb (the reason real
    * lexical-mining systems prune by document frequency or impact).
    * Terms with df > maxDf are dropped from scoring on BOTH sides —
    * their idf ≈ ln(1 + ε) contributes least of any term — bounding
    * every term key's postings side at maxDf rows; AQE's skew split
    * handles residual query-side imbalance. The semantic is therefore
    * DF-CAPPED BM25 (scores differ from [[bm25TopK]] exactly by the
    * dropped near-zero-idf terms; N and avgdl stay full-corpus), and
    * the oracle replays the cap. */
  def bm25TopKLarge(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, maxDf: Long,
      k1: Double = 1.2, b: Double = 0.75,
      positives: Option[DataFrame] = None): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(maxDf > 0, s"maxDf must be positive: $maxDf")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params: k1=$k1 b=$b")
    val tok = docs
      .select(col(idCol), explode(graft.text.TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    // the cap drops terms from SCORING only — N and avgdl keep the
    // textbook full-corpus denominators
    val dfKept = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      .crossJoin(tok.agg(count(lit(1)).cast("double").as("total_tok")))
      .select(col("n_docs"), (col("total_tok") / col("n_docs")).as("avgdl"))
    val qterms = queries
      .select(col("query_id"),
        explode(graft.text.TextOps.tokens(col("query_text"))).as("term"))
      .filter(col("term") =!= "").distinct()
    // The df-cap join applies FIRST (guide §3: the selective join
    // before the multiplying one). Inner joins commute, so the result
    // is identical either way, but the intermediate is not: capping
    // after the query join materializes Σ_t df(t)·qd(t) over ALL terms
    // — the hot-term quadratic blowup maxDf exists to prevent (measured
    // at sf0.1: 448M intermediate rows, a 50 s single stage; capped
    // first it is 62.5k rows, and the stage vanishes). dfKept is an
    // aggregate of tf on term, so this join reuses tf's term exchange.
    val scored = tf
      .join(dfKept.hint("shuffle_hash"), "term") // inner join IS the cap
      .join(qterms.hint("shuffle_hash"), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol), bm25ScoreCol(k1, b).as("s"))
    rankBm25(scored, idCol, k, positives)
  }

  /** Per-doc hashed n-gram feature stream (unigrams + bigrams bucketed
    * by md5 — the DSIR paper's hashed n-gram features): one (id,
    * bucket) row per gram OCCURRENCE, so a per-bucket aggregate over
    * the stream is the corpus's hashed-n-gram count vector and a
    * per-doc aggregate is the doc's. Deterministic (md5), so both the
    * weights and the selection replay in the oracle. */
  private def gramBuckets(df: DataFrame, idCols: Seq[Column],
      textCol: String, buckets: Int): DataFrame = {
    // native kernel (graft_word_grams ≡ the composed filter/zip_with
    // gram stream, KernelPropertySpec-pinned): the composed form ran
    // two interpreted HOF walks per row on DSIR's dominant scan — the
    // raw corpus, the one input that IS 100 TB-sized in production
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select((idCols :+ explode(
        graft.functions.GraftFunctions.wordGrams(col(textCol))).as("gram")): _*)
      .select((idCols :+
        graft.core.Hashing.md5Bucket(col("gram"), buckets).as("bucket")): _*)
  }

  /** Adjacent-token pairs of `w`, empty-safe (size < 2 → []), combined
    * by the caller (struct pairs for the bigram LM, "a b" strings for
    * hashed grams) — single-sourced so the engine-side bigram
    * definition cannot drift between consumers; both mirror DuckDB's
    * 1-indexed `range(1, len(w))` transform. */
  private def adjacentPairs(w: Column, resultType: String)(
      combine: (Column, Column) => Column): Column =
    when(size(w) >= 2,
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        combine))
      .otherwise(array().cast(resultType))

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023), the principled "select raw data that looks like my
    * target domain" operator: estimate hashed-n-gram bag-of-words
    * distributions for the TARGET sample and the RAW corpus, weight
    * every raw document by its log importance ratio
    *
    *   log w(doc) = Σ_grams [ ln p̂_target(bucket) − ln p̂_raw(bucket) ]
    *
    * (add-one smoothing over the `buckets` hashed features on both
    * sides), and keep the top `k` (the paper resamples with Gumbel
    * noise; the deterministic top-k is the reproducible variant —
    * rerun/retry-stable, which a curation pipeline needs more than
    * sampling jitter). Weights round to 6 dp before the cut, ties by
    * id; gram-less documents carry no evidence and are never selected.
    *
    * Scale shape: the bucket-count tables are ≤ `buckets` rows (the
    * whole point of feature hashing — the "distribution" is a bounded
    * vector however large the corpora), so the log-ratio table
    * BROADCASTS; the raw corpus pays one tokenization scan and one
    * per-doc aggregate; the target sample is eval-sized by contract.
    * Nothing vocabulary- or corpus-sized shuffles. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // TakeOrdered merges k rows ON THE DRIVER — the right plan for
    // report-sized selections (and the only one that yields a global
    // sel_rank without a single-partition window), a scale-killer at
    // DSIR's production regime (k ≈ corpus fraction). The bound is the
    // trainQualityWeights loud-iters pattern: ~4M (id, weight) rows ≈
    // 100 MB driver heap, far past any report, far short of any OOM.
    require(k <= (1 << 22),
      s"k=$k exceeds dsirSelect's driver-merge bound ${1 << 22} — " +
        "corpus-fraction selection budgets belong on dsirSelectThreshold, " +
        "whose quantile-bracket cut never materializes O(k) rows anywhere")
    val weights = dsirWeights(raw, target, idCol, textCol, buckets)
    // the global cut plans as TakeOrderedAndProject (k rows per
    // partition, k merged on the driver) — a rank WINDOW here would
    // single-partition the whole weighted corpus; ranks attach after,
    // over the k survivors only
    val top = weights.orderBy(col("dsir_weight").desc, col(idCol)).limit(k)
    val w = Window.orderBy(col("dsir_weight").desc, col(idCol))
    top.withColumn("sel_rank", row_number().over(w).cast("long"))
      .select(col(idCol), col("sel_rank"), col("dsir_weight"))
  }

  /** The DSIR importance weights without any cut: one row per raw
    * document carrying its 6-dp-rounded summed log importance ratio —
    * the corpus-sized, fully distributed half both cut variants share
    * (see [[dsirSelect]] for the math and the scale-shape argument). */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in 2..65536 (md5Bucket's entropy bound): $buckets")
    // per-(doc, bucket) counts FIRST, with both downstream consumers
    // (the raw distribution and the per-doc weights) deriving from this
    // one aggregate — its (id, bucket)-keyed exchange subtree is
    // identical in both branches, so ReuseExchange runs the corpus
    // scan + tokenize + hash pipeline ONCE (the bigramLmScore trick;
    // grouping rawGrams separately per consumer would defeat reuse and
    // double the dominant cost)
    val perDoc = gramBuckets(raw, Seq(col(idCol)), textCol, buckets)
      .groupBy(idCol, "bucket").agg(count(lit(1)).as("n"))
    val cr = perDoc.groupBy("bucket").agg(sum("n").as("cr"))
    val ct = gramBuckets(target, Seq.empty, textCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val totals = cr.agg(sum("cr").cast("double").as("tr"))
      .crossJoin(ct.agg(coalesce(sum("ct"), lit(0L)).cast("double").as("tt")))
    // log-ratio per bucket PRESENT IN RAW (absent-from-raw buckets can
    // never be referenced by a raw doc); a bucket absent from the
    // target takes the smoothed floor 1/(tt + buckets)
    val lr = cr.join(ct, Seq("bucket"), "left_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("tt") + buckets)) -
          log((col("cr") + 1.0) / (col("tr") + buckets))).as("lr"))
    perDoc.join(broadcast(lr), "bucket")
      .groupBy(idCol).agg(round(sum(col("n") * col("lr")), 6).as("dsir_weight"))
  }

  /** [[dsirSelect]] at PRODUCTION selection budgets (k ≈ a corpus
    * fraction, 10⁷–10⁹ documents): the same top-k-by-(weight desc, id)
    * set, selected by a DISTRIBUTED THRESHOLD CUT instead of a
    * driver-merged TakeOrdered — no plan node ever materializes O(k)
    * rows on the driver or in a single task. Returns (idCol,
    * dsir_weight) for exactly the selected documents; deliberately NO
    * global `sel_rank` — a rank over 10⁸ survivors would serialize
    * them through one window task for a number nothing downstream
    * reads (selection is membership; report-sized audits belong on
    * [[dsirSelect]]).
    *
    * Mechanics — quantile bracket + exact boundary resolution:
    *  1. weight cutoff bracketed at quantile 1−k/N via
    *     `approxQuantile` (one pass over the persisted weights) at
    *     widening margins, each bracket VERIFIED by exact counts;
    *  2. rows above the bracket's high edge are in unconditionally;
    *  3. the boundary slice (between the bracket edges) — sized by the
    *     quantile error budget (≈ relErr·N rows), independent of k —
    *     resolves exactly: ranked by (weight desc, id) and cut to the
    *     remaining budget. Catalyst rewrites the rank-filtered window
    *     into an INTERIOR TakeOrderedAndProject whose limit is that
    *     remaining budget — executor-merged (non-root) and
    *     err-bounded, never k rows on the driver (PlanAuditSpec pins
    *     both). The slice is loud-bounded by `maxBoundary` (only a
    *     degenerate near-constant weight distribution can exceed it —
    *     then the quantile cannot separate, and selection is
    *     arbitrary-by-tie anyway; the error message says so).
    *
    * The selected SET is exactly deterministic (6-dp weights, id
    * ties) whatever bracket the sketch lands on — the bracket affects
    * intermediate sizes only. The weights frame persists
    * MEMORY_AND_DISK for the multi-pass (count, quantile, bracket
    * check, final filter): re-deriving it per pass would re-pay the
    * corpus tokenization scan four times. */
  def dsirSelectThreshold(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, k: Long, buckets: Int = 1024,
      relErr: Double = 1e-4, maxBoundary: Long = 50000000L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(relErr > 0 && relErr < 0.1, s"relErr must be in (0, 0.1): $relErr")
    val weights = dsirWeights(raw, target, idCol, textCol, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = weights.count()
    if (k >= n) return weights.select(col(idCol), col("dsir_weight"))
    val q = 1.0 - k.toDouble / n
    // widening bracket attempts; the last is the no-low-edge fallback
    // (boundary = everything at or below the high edge) whose validity
    // is unconditional — only the loud maxBoundary bound can refuse it
    val brackets = Seq(4 * relErr, 32 * relErr).map(m =>
      (math.max(0.0, q - m), math.min(1.0, q + m))) :+ (-1.0, math.min(1.0, q + 32 * relErr))
    val chosen = brackets.view.map { case (qLo, qHi) =>
      val hi = weights.stat
        .approxQuantile("dsir_weight", Array(qHi), relErr).head
      val lo =
        if (qLo < 0) Double.NegativeInfinity
        else weights.stat.approxQuantile("dsir_weight", Array(qLo), relErr).head
      // one pass verifies the bracket exactly: rows strictly above each
      // edge (ties AT an edge stay in the slice below it)
      val r = weights.agg(
        sum(when(col("dsir_weight") > hi, 1L).otherwise(0L)).as("above_hi"),
        sum(when(col("dsir_weight") > lo, 1L).otherwise(0L)).as("above_lo"))
        .head()
      (lo, hi, r.getLong(0), r.getLong(1))
    }.collectFirst { case ok @ (_, _, aboveHi, aboveLo)
        if aboveHi <= k && aboveLo >= k => ok }
      .getOrElse(throw new IllegalStateException(
        "unreachable: the no-low-edge bracket is always valid"))
    val (lo, hi, aboveHi, _) = chosen
    val boundarySize = weights
      .filter(col("dsir_weight") <= hi && col("dsir_weight") > lo).count()
    require(boundarySize <= maxBoundary,
      s"DSIR boundary slice has $boundarySize rows (> $maxBoundary): the " +
        "weight distribution is too tied for a quantile to separate " +
        s"(${n} docs, cutoff ≈ $hi) — at near-constant weights the top-k " +
        "is arbitrary-by-tie; widen maxBoundary knowingly or fix the " +
        "feature hashing (more buckets) so weights discriminate")
    val need = k - aboveHi
    val sure = weights.filter(col("dsir_weight") > hi)
      .select(col(idCol), col("dsir_weight"))
    val wnd = Window.orderBy(col("dsir_weight").desc, col(idCol))
    val picked = weights
      .filter(col("dsir_weight") <= hi && col("dsir_weight") > lo)
      .withColumn("_rn", row_number().over(wnd))
      .filter(col("_rn") <= need)
      .select(col(idCol), col("dsir_weight"))
    sure.unionByName(picked)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher) of two rankings
    * over the same id space — the standard hybrid-retrieval combiner
    * (lexical BM25 × dense cosine) for curation and retriever-training
    * candidate generation: rrf(q, d) = Σ_r 1/(k0 + rank_r(q, d)) over
    * the rankings that contain (q, d); a document absent from one
    * ranking simply contributes nothing. Scores are rounded to 6 dp
    * BEFORE the fused rank cut (the engine-wide cross-engine cut
    * discipline), ties broken by id.
    *
    * Both inputs must expose (query_id, `idCol`, rank). Scale shape:
    * the union and the fused aggregate carry three scalar columns; one
    * exchange for the per-(query, id) sum, one for the per-query top-k
    * window — input sizes are ranking-sized (|Q| × k_in), never
    * corpus-sized. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
      k0: Int = 60): DataFrame =
    rrfFuseWeighted(Seq(a -> 1.0, b -> 1.0), idCol, k, k0)

  /** [[rrfFuse]] generalized to N WEIGHTED rankings — the production
    * hybrid-search shape (w_lex · BM25 + w_dense · cosine + w_prior ·
    * a query-independent quality prior):
    * rrf(q, d) = Σ_r w_r / (k0 + rank_r(q, d)). Same rounding/cut
    * discipline and scale shape as the two-way form: everything is
    * ranking-sized scalars, one keyed aggregate, one top-k window. */
  def rrfFuseWeighted(rankings: Seq[(DataFrame, Double)], idCol: String,
      k: Int, k0: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(k0 >= 0, s"k0 must be non-negative: $k0")
    require(rankings.nonEmpty, "no rankings to fuse")
    require(rankings.forall(_._2 > 0), s"ranking weights must be positive")
    val slim = rankings.map { case (df, w) =>
      df.select(col("query_id"), col(idCol),
        (lit(w) / (lit(k0) + col("rank"))).as("contrib"))
    }
    val fused = slim.reduce(_ unionAll _)
      .groupBy("query_id", idCol)
      .agg(round(sum("contrib"), 6).as("rrf"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col(idCol))
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("fused_rank"), col(idCol), col("rrf"))
  }

  /** Ranked-retrieval evaluation — MRR@k and nDCG@k per query, the
    * report a retrieval stack (BM25 / ANN / fused) publishes against a
    * labeled eval set. `ranked` exposes (query_id, idCol, rank);
    * `labels` exposes (query_id, idCol, rel) with graded relevance
    * ≥ 0 (sparse: unlabeled pairs are rel 0 by construction).
    *
    *  - rr    = 1 / min rank of a rel>0 document within the cut, 0 if
    *            none retrieved;
    *  - dcg   = Σ_{rank ≤ k} (2^rel − 1) / log2(rank + 1);
    *  - idcg  = the same sum over the IDEAL ordering of that query's
    *            labels (rel desc, id asc — deterministic), truncated
    *            at k; ndcg = dcg/idcg, 0 when the query has no
    *            positive labels.
    *
    * All values rounded to 6 dp. Scale shape: one ranking⋈labels hash
    * join on scalar keys, per-query aggregates, and a labels-only
    * window for the ideal ordering — eval-set-sized throughout, no
    * corpus anywhere. */
  def rankingMetrics(ranked: DataFrame, labels: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val cut = ranked.filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rank"))
    val lab = labels.select(col("query_id"), col(idCol),
      col("rel").cast("double").as("rel"))
    val hits = cut.join(lab, Seq("query_id", idCol))
      .select(col("query_id"), col("rank"), col("rel"))
    val perQ = hits.groupBy("query_id").agg(
      min(when(col("rel") > 0, col("rank"))).as("first_hit"),
      sum((pow(lit(2.0), col("rel")) - 1.0) /
        log2(col("rank").cast("double") + 1.0)).as("dcg"))
    // ideal DCG from the labels alone: rel desc, id asc, truncate at k
    val iw = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col(idCol))
    val ideal = lab.filter(col("rel") > 0)
      .withColumn("pos", row_number().over(iw))
      .filter(col("pos") <= k)
      .groupBy("query_id")
      .agg(sum((pow(lit(2.0), col("rel")) - 1.0) /
        log2(col("pos").cast("double") + 1.0)).as("idcg"))
    // every ranked query reports, even with zero hits or zero labels
    cut.select("query_id").distinct()
      .join(perQ, Seq("query_id"), "left_outer")
      .join(ideal, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        round(coalesce(lit(1.0) / col("first_hit"), lit(0.0)), 6).as("rr"),
        round(coalesce(col("dcg"), lit(0.0)), 6).as("dcg"),
        round(coalesce(col("idcg"), lit(0.0)), 6).as("idcg"),
        round(when(coalesce(col("idcg"), lit(0.0)) > 0,
          coalesce(col("dcg"), lit(0.0)) / col("idcg"))
          .otherwise(lit(0.0)), 6).as("ndcg"))
  }

  /** The trained-quality-classifier feature vector: bias + the four
    * deterministic quality signals the fixed model
    * ([[graft.text.TextOps.qualityModelScore]]) weighs — length
    * saturation, punctuation ratio, capped stopword ratio, bigram
    * repetition. All kernel-computed Columns; no UDFs. */
  private def qualityFeatures(text: Column): Seq[Column] = Seq(
    lit(1.0),
    least(lit(1.0), length(text).cast("double") / 500.0),
    graft.text.TextOps.punctRatio(text),
    least(lit(1.0), graft.text.TextOps.stopwordRatio(text) * 4.0),
    graft.text.TextOps.duplicateNgramFraction(text))

  /** In-engine TRAINED quality classifier — the CCNet/GPT-3 recipe's
    * missing half: [[graft.text.TextOps.qualityModelScore]] scores with
    * FIXED weights; this FITS the weights to a label column by batch
    * gradient descent on the logistic loss, entirely inside the
    * engine. Each iteration is ONE aggregation over the training
    * frame (avg of (σ(w·x) − y)·x per feature — partial+final
    * combine, scalars only); the weight vector lives on the driver (5
    * doubles) and is ROUNDED to 6 dp after every update, which is
    * what makes the whole trajectory — and therefore the scores —
    * reproducible across engines and partitionings (a float sum's
    * ULP-level order sensitivity cannot survive the rounding).
    *
    * `iters` is loud-bounded (≤ 50): the driver loop runs one Spark
    * job per iteration by design — batch GD on bounded features
    * converges in a handful of steps, and a caller wanting an epoch
    * count belongs in a real trainer, not a curation engine. At
    * corpus scale the training frame is a labeled SAMPLE by contract
    * (the recall-report precedent); SCORING with the result is one
    * codegen'd projection over any corpus size. */
  def trainQualityWeights(docs: DataFrame, textCol: String, label: Column,
      iters: Int, lr: Double): Seq[Double] = {
    require(iters >= 1 && iters <= 50,
      s"iters must be in [1, 50] (one Spark job per iteration): $iters")
    require(lr > 0, s"learning rate must be positive: $lr")
    val feats = qualityFeatures(col(textCol))
    var w = Seq.fill(feats.size)(0.0)
    for (_ <- 0 until iters) {
      val z = feats.zip(w).map { case (f, wi) => f * lit(wi) }.reduce(_ + _)
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - label.cast("double")
      val aggs = feats.zipWithIndex.map { case (f, i) => avg(err * f).as(s"g$i") }
      val g = docs.agg(aggs.head, aggs.tail: _*).head()
      w = w.indices.map(i => round6(w(i) - lr * g.getDouble(i)))
    }
    w
  }

  /** Half-up to 6 dp — the same tie behavior as Spark's and DuckDB's
    * `round(x, 6)` (away from zero), so driver-side weight updates and
    * the oracle's SQL updates stay bit-comparable. */
  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Score a corpus with [[trainQualityWeights]]' result: σ(w·x)
    * rounded to 6 dp, keep = score ≥ 0.5. One codegen'd projection —
    * no shuffle, no state. */
  def scoreTrainedQuality(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Double]): DataFrame = {
    val feats = qualityFeatures(col(textCol))
    require(weights.size == feats.size,
      s"expected ${feats.size} weights (bias + 4 features): $weights")
    val z = feats.zip(weights).map { case (f, wi) => f * lit(wi) }.reduce(_ + _)
    docs.select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"))
      .withColumn("keep", when(col("score") >= 0.5, 1L).otherwise(0L))
  }

  /** Corpus-trained bigram language-model score per document: the mean
    * log-probability avg ln P(w_i | w_{i-1}) under an add-one-smoothed
    * bigram model whose counts come from the corpus itself — the
    * KenLM/CCNet-style perplexity-proxy quality signal (low score =
    * unusual token sequences = boilerplate, garbled, or off-domain
    * text). P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V) with V the
    * unigram-vocabulary size. Documents under 2 tokens have no bigrams
    * and are absent from the result (the caller decides their fate).
    *
    * Scale shape: bigrams are built PER ROW (zip of the token array
    * with its own tail — no position window, no self-join) and
    * exploded scan-side. The model tables are vocabulary-sized
    * (unigrams) and vocab²-bounded-by-observed (bigrams), so both
    * broadcast; the per-document score is then one partial+final
    * aggregate keyed by doc id. Nothing corpus-sized is ever shuffled
    * except the (doc, w1, w2, count) stream, which partial map-side
    * aggregation compacts first. The score is rounded to 6 dp, wide
    * enough that f64 summation-order differences across engines
    * (~1e-14) never surface.
    */
  def bigramLmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // empty tokens (consecutive/leading spaces) are dropped, matching
    // tfIdfTopTerms/learnBpeMerges — "" must not join the vocabulary
    // and inflate V for every probability
    val tok = docs.select(col(idCol),
      filter(graft.text.TextOps.tokens(col(textCol)), t => t =!= "").as("w"))
    val bigrams = tok
      .select(col(idCol),
        explode(adjacentPairs(col("w"), "array<struct<w1:string,w2:string>>")(
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = tok.select(explode(col("w")).as("w1")).groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = uni.agg(count(lit(1)).cast("double").as("v"))
    val perDoc = bigrams.groupBy(idCol, "w1", "w2").agg(count(lit(1)).as("k"))
    // global bigram counts derive from the per-doc counts (the same
    // trick tfIdfTopTerms uses for df) — deriving them from `bigrams`
    // directly would re-run the corpus scan + zip + explode a second
    // time, since the differing grouping keys defeat exchange reuse
    val bc = perDoc.groupBy("w1", "w2").agg(sum(col("k")).as("c12"))
    perDoc
      .join(broadcast(bc), Seq("w1", "w2"))
      .join(broadcast(uni), Seq("w1"))
      .crossJoin(broadcast(v))
      .groupBy(idCol)
      .agg(
        sum(col("k")).as("n_bigrams"),
        round(sum(col("k") * log((col("c12") + 1.0) / (col("c1") + col("v")))) / sum(col("k")), 6)
          .as("lm_score"))
  }

  /** Learn the first `k` BPE merge rules from the corpus — the TRAINER
    * side of tokenization (`TextOps.bpeTokenCount` applies a regex
    * proxy; this learns real merges). Classic byte-pair encoding over
    * word character sequences: repeatedly merge the most frequent
    * adjacent symbol pair, ties broken lexicographically so training
    * is deterministic.
    *
    * Scale shape — the standard tokenizer-trainer split: the ONE
    * corpus-sized pass is the distributed word-frequency aggregation
    * (partial+final count keyed by word); the merge iterations then
    * run over that WORD TABLE, which is vocabulary-sized (millions of
    * rows at web scale, not corpus-sized) and is collected — exactly
    * how production BPE trainers work. `minFreq` is the trainer's
    * vocabulary bound: a web-scale corpus's word table (typos, URLs,
    * unicode noise) is long-tailed, and dropping words seen fewer than
    * `minFreq` times BEFORE the collect caps what the driver holds —
    * rare words contribute ~nothing to pair counts, so the floor
    * trades negligible merge-quality for a hard memory bound. But
    * `minFreq` is a caller-supplied knob defaulting to 1, so it is
    * not a GUARANTEE: `maxVocab` is — the collect takes only the
    * `maxVocab` most frequent surviving words (count-descending,
    * word-ascending for determinism), an UNCONDITIONAL driver bound
    * the way `removeBoilerplateLines`' `maxBoilerLines` is. At web
    * scale the distinct-word set (typos, URLs, hashes) is O(10⁸) and
    * an unbounded collect IS the trainer's bottleneck; truncating the
    * long tail is the standard tokenizer-trainer approximation (the
    * dropped words are by construction the rarest, contributing least
    * to pair counts).
    *
    * Returns (left, right, pairCount) in merge order.
    */
  def learnBpeMerges(docs: DataFrame, textCol: String, k: Int,
      minFreq: Long = 1L, maxVocab: Int = 1000000): Seq[(String, String, Long)] = {
    require(k > 0, s"k must be positive: $k")
    require(minFreq >= 1, s"minFreq must be >= 1: $minFreq")
    require(maxVocab >= 1, s"maxVocab must be >= 1: $maxVocab")
    val wordFreq = docs
      .select(explode(graft.text.TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .filter(col("count") >= minFreq)
      // TakeOrdered top-V, never a full sort: the driver holds at most
      // maxVocab (word, count) pairs no matter what the corpus says
      .orderBy(col("count").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var words: Array[(Array[String], Long)] =
      wordFreq.map { case (w, c) => (toSymbols(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    while (i < k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      if (counts.isEmpty) i = k
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b, cnt))
        words = words.map { case (syms, c) => (mergePair(syms, a, b), c) }
        i += 1
      }
    }
    merges.toSeq
  }

  /** Base segmentation shared by training and application — the two
    * MUST split identically or learned rules stop matching at apply
    * time. Splits on CODE POINTS, not UTF-16 units: a char-level split
    * would break non-BMP symbols (emoji, rare CJK) into unpaired
    * surrogate halves and learn merges over malformed strings. */
  private def toSymbols(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** One left-to-right pass replacing every adjacent (a, b) with the
    * merged symbol — the step shared by training and application. */
  private def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += a + b; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Segment one word under an ordered merge-rule list (BPE
    * application: each rule applies exhaustively in learned priority
    * order) — returns the piece sequence. */
  def segmentBpe(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = toSymbols(word)
    merges.foreach { case (a, b) => syms = mergePair(syms, a, b) }
    syms.toSeq
  }

  /** Apply learned BPE merges to the corpus: per-document piece counts
    * under the rule list — the APPLY half of the tokenizer two-phase
    * (learnBpeMerges trains). Each DISTINCT word is segmented exactly
    * once, DISTRIBUTEDLY: the merge list is k-sized and broadcasts,
    * and the vocabulary-sized distinct-token table segments inside a
    * `mapPartitions` stage — NOTHING vocab- or corpus-sized is ever
    * collected to the driver (a web corpus's distinct-token set —
    * typos, URLs, unicode noise — is orders of magnitude past driver
    * RAM; CorpusOpsSpec pins that building this frame runs zero jobs).
    * The corpus-sized token stream is compacted to per-document token
    * counts first (partial map-side combine), so the piece-count join
    * and the final aggregate only ever exchange scalar
    * (doc, token, count) rows.
    *
    * Documents with no non-empty tokens have nothing to segment and
    * are ABSENT from the result (the same absence contract as
    * bigramLmScore's sub-2-token documents — the caller decides their
    * fate).
    */
  def applyBpePieceCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs
      .select(col(idCol), explode(graft.text.TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val perDocTok = tok.groupBy(idCol, "token").agg(count(lit(1)).as("cnt"))
    val mergesB = spark.sparkContext.broadcast(merges)
    val pieces = perDocTok.select("token").distinct().as[String]
      .mapPartitions { it =>
        val m = mergesB.value
        it.map(w => (w, segmentBpe(w, m).length.toLong))
      }.toDF("token", "n_pieces")
    perDocTok.join(pieces, "token")
      .groupBy(idCol)
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("n_pieces")).as("n_pieces"))
  }

  /** The learned tokenizer's VOCABULARY with corpus frequencies: every
    * piece the merge rules produce, weighted by word frequency — the
    * table a tokenizer ships (and the coverage diagnostic for choosing
    * k). Top-`k` pieces by total occurrences, ties on the piece string.
    *
    * Scale shape — same trainer split as applyBpePieceCounts: one
    * corpus pass aggregates word frequencies (partial+final, keyed by
    * word); the vocabulary-sized word table segments DISTRIBUTEDLY in
    * a mapPartitions stage with the k-sized merge list broadcast;
    * pieces explode off it and aggregate keyed by piece; the cut is a
    * TakeOrdered, never a full vocabulary sort. Nothing is collected.
    */
  def bpePieceFrequencies(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreq = docs
      .select(explode(graft.text.TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val mergesB = spark.sparkContext.broadcast(merges)
    val segmented = wordFreq.as[(String, Long)]
      .mapPartitions { it =>
        val m = mergesB.value
        it.map { case (w, f) => (f, segmentBpe(w, m).toArray) }
      }.toDF("freq", "pieces")
    segmented
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("piece"))
      .limit(k)
  }

  // ── Unigram LM tokenizer (the SentencePiece complement to BPE) ─────

  /** Viterbi segmentation of one word under a unigram-LM piece table —
    * the decode every unigram tokenizer ships (SentencePiece's
    * default): dp(i) = best dp(j) + logp(syms[j..i)) over the last
    * `maxPieceLen` split points; ties on EXACT score break to the
    * lexicographically smallest piece list, so training and the DuckDB
    * oracle replay cut identically. Single code points NOT in the
    * vocabulary fall back to `floorLogp` (the smoothed zero-count
    * probability) — every position stays reachable, so unseen
    * characters at apply time degrade instead of failing. Code-point
    * symbols, like [[segmentBpe]]. */
  def viterbiSegment(word: String, logp: scala.collection.Map[String, Double],
      floorLogp: Double, maxPieceLen: Int): Seq[String] = {
    val syms = toSymbols(word)
    val n = syms.length
    if (n == 0) return Seq.empty
    def lexLt(a: Vector[String], b: Vector[String]): Boolean = {
      var i = 0
      while (i < a.length && i < b.length) {
        val c = a(i).compareTo(b(i))
        if (c != 0) return c < 0
        i += 1
      }
      a.length < b.length
    }
    val best = new Array[(Double, Vector[String])](n + 1)
    best(0) = (0.0, Vector.empty)
    var i = 1
    while (i <= n) {
      var cur: (Double, Vector[String]) = null
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != null) {
          val piece = syms.slice(j, i).mkString
          val lp =
            if (i - j == 1) logp.getOrElse(piece, floorLogp)
            else logp.getOrElse(piece, Double.NaN)
          if (!lp.isNaN) {
            val sc = best(j)._1 + lp
            val sg = best(j)._2 :+ piece
            if (cur == null || sc > cur._1 ||
                (sc == cur._1 && lexLt(sg, cur._2))) cur = (sc, sg)
          }
        }
        j += 1
      }
      best(i) = cur // never null: the single-code-point fallback always applies
      i += 1
    }
    best(n)._2
  }

  /** One unigram-LM vocabulary state: (piece, count, 6-dp log prob)
    * rows plus the smoothed zero-count floor the Viterbi falls back to
    * for unknown single code points. */
  final case class UnigramVocab(pieces: Seq[(String, Long, Double)],
      floorLogp: Double) {
    def logp: Map[String, Double] = pieces.map(p => p._1 -> p._3).toMap
  }

  private def unigramMStep(counts: Seq[(String, Long)]): UnigramVocab = {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t = counts.map(_._2).sum.toDouble
    val v = counts.size.toDouble
    UnigramVocab(
      counts.map { case (p, c) => (p, c, r6(math.log((c + 1.0) / (t + v)))) },
      r6(math.log(1.0 / (t + v))))
  }

  /** Train a unigram-LM tokenizer (the SentencePiece architecture;
    * Kudo 2018) — the OTHER production tokenizer family next to the
    * BPE chain: seed the piece inventory from substring frequencies,
    * then run `emRounds` hard-EM rounds (Viterbi E-step under the
    * current probabilities, count-renormalizing M-step with add-one
    * smoothing) pruning to the `vocabSize` highest-count pieces each
    * round. Single-code-point pieces are NEVER pruned (coverage: every
    * word must stay segmentable), and probabilities round to 6 dp so
    * the whole EM trajectory replays in the oracle — seed counts, each
    * round's segmentations, counts, pruning cut and re-smoothed probs.
    * Hard-EM (Viterbi counts, not forward-backward expectations) is
    * the deterministic, cross-engine-replayable variant; the pruning
    * criterion is count (the likelihood-loss ranking's monotone proxy
    * under a fixed segmentation).
    *
    * Scale shape — the tokenizer-trainer split, FULLY distributed
    * (unlike [[learnBpeMerges]], nothing word-table-sized ever reaches
    * the driver): the corpus pays ONE tokenization scan for the
    * word-frequency table, which persists (vocabulary-sized, reused by
    * the seed pass and every round); the seed substring aggregate and
    * each E-step are one aggregation job each — Viterbi runs inside
    * mapPartitions with the piece table BROADCAST (it is ≤ seedSize +
    * alphabet rows by construction), and only piece-count tables
    * (vocab-sized) are ever collected. `emRounds` is loud-bounded, the
    * trainQualityWeights precedent. */
  def trainUnigramLm(docs: DataFrame, textCol: String, vocabSize: Int,
      emRounds: Int, maxPieceLen: Int = 4, seedSize: Int = 65536,
      minFreq: Long = 1L): UnigramVocab = {
    require(vocabSize >= 1 && vocabSize <= (1 << 21),
      s"vocabSize must be in 1..${1 << 21}: $vocabSize")
    require(emRounds >= 1 && emRounds <= 16,
      s"emRounds must be in 1..16 (each is a full E-step aggregation " +
        s"job; the trajectory is meant to be short): $emRounds")
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen must be in 2..16: $maxPieceLen")
    require(seedSize >= 1 && seedSize <= (1 << 21),
      s"seedSize must be in 1..${1 << 21}: $seedSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = docs
      .select(explode(graft.text.TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed substring counts, distributed: every (start, len ≤
    // maxPieceLen) window of every word, weighted by word frequency.
    // Spark's length/substr index CODE POINTS (as do DuckDB's and
    // toSymbols), so all three sides window identically.
    val subs = wf
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")))).as("s"))
      .select(col("w"), col("freq"), col("s"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - col("s") + 1))).as("l"))
      .select(col("w").substr(col("s"), col("l")).as("piece"), col("freq"))
    val seedCounts = subs.groupBy("piece").agg(sum("freq").as("cnt"))
    // top-seedSize TakeOrdered ∪ ALL single code points (coverage;
    // bounded by the corpus alphabet — code-point space, not vocab)
    val seed = seedCounts.orderBy(col("cnt").desc, col("piece")).limit(seedSize)
      .unionByName(seedCounts.filter(length(col("piece")) === 1))
      .distinct().as[(String, Long)].collect().toSeq
    var vocab = unigramMStep(seed)
    var round = 0
    while (round < emRounds) {
      val lpB = spark.sparkContext.broadcast(vocab.logp)
      val floor = vocab.floorLogp
      val mpl = maxPieceLen
      // E-step: one aggregation job — counts land vocab-sized (the
      // segmentation can only emit pieces the broadcast table holds,
      // plus floor singles already counted in the alphabet)
      val counts = wf.as[(String, Long)]
        .mapPartitions { it =>
          it.flatMap { case (w, f) =>
            viterbiSegment(w, lpB.value, floor, mpl).map(p => (p, f)) }
        }.toDF("piece", "freq")
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .as[(String, Long)].collect()
      val cmap = counts.toMap
      val top = counts.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
      val singles = vocab.pieces.collect {
        case (p, _, _) if p.codePointCount(0, p.length) == 1 =>
          (p, cmap.getOrElse(p, 0L))
      }
      vocab = unigramMStep((top ++ singles).distinct.toSeq)
      lpB.destroy()
      round += 1
    }
    wf.unpersist()
    vocab
  }

  /** Apply a trained unigram-LM vocabulary to the corpus: per-document
    * (token count, Viterbi piece count) — [[applyBpePieceCounts]]'s
    * shape on the unigram decode. Each DISTINCT word segments exactly
    * once, inside mapPartitions with the piece table broadcast;
    * nothing vocab- or corpus-sized is collected. Token-free documents
    * are absent (the BPE-apply absence contract). */
  def applyUnigramPieceCounts(docs: DataFrame, idCol: String,
      textCol: String, vocab: UnigramVocab,
      maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs
      .select(col(idCol), explode(graft.text.TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val perDocTok = tok.groupBy(idCol, "token").agg(count(lit(1)).as("cnt"))
    val lpB = spark.sparkContext.broadcast(vocab.logp)
    val floor = vocab.floorLogp
    val mpl = maxPieceLen
    val pieces = perDocTok.select("token").distinct().as[String]
      .mapPartitions { it =>
        it.map(w => (w, viterbiSegment(w, lpB.value, floor, mpl).length.toLong))
      }.toDF("token", "n_pieces")
    perDocTok.join(pieces, "token")
      .groupBy(idCol)
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("n_pieces")).as("n_pieces"))
  }

  /** The unigram tokenizer's SHIPPED vocabulary with corpus
    * frequencies: every piece the Viterbi decode produces over the
    * corpus, weighted by word frequency — [[bpePieceFrequencies]]'
    * shape on the unigram decode (top-`k` by occurrences, ties on the
    * piece string; TakeOrdered cut, nothing collected). Distinct from
    * the TRAINED counts in [[UnigramVocab]] only when applied to a
    * different corpus than the trainer saw. */
  def unigramPieceFrequencies(docs: DataFrame, textCol: String,
      vocab: UnigramVocab, k: Int, maxPieceLen: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreq = docs
      .select(explode(graft.text.TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val lpB = spark.sparkContext.broadcast(vocab.logp)
    val floor = vocab.floorLogp
    val mpl = maxPieceLen
    val segmented = wordFreq.as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (w, f) =>
          (f, viterbiSegment(w, lpB.value, floor, mpl).toArray) }
      }.toDF("freq", "pieces")
    segmented
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("piece"))
      .limit(k)
  }

  /** Length-bucketed inference batching: docs bucket by the power-of-2
    * ceiling of their token count (bucket = bit-length of tok−1, an
    * INTEGER computation so engines agree exactly — f64 log2 wobbles
    * at the boundaries; tok = 1 is bucket 0 explicitly, since the
    * bit-length of 0 renders as 1 in both engines' bin()), batch
    * within a (bucket, shard) group in id order, `maxBatch` docs per
    * batch. Returns per-batch occupancy and the padding efficiency
    * (real tokens / padded slot tokens at the bucket's padded length
    * 2^bucket) — the report that decides a serving/eval batcher's
    * bucket boundaries: batching by length is how inference avoids
    * padding every sequence to the corpus max.
    *
    * Scale shape: the bucket key alone is LOG-SIZED (~30 power-of-2
    * ceilings exist, ever), so a bucket-partitioned window would cap
    * the sort stage at ~30 tasks each holding N/30 rows — the same
    * constant-cardinality-key failure the entity-resolution re-block
    * eliminated. Batches are therefore numbered within
    * (bucket, shard): a deterministic md5 shard of the id (the
    * packConcatChunk shard pattern) keeps every window partition
    * bounded at N/(buckets·shards) while batches stay reproducible —
    * same input → same batches, any cluster size. One hash exchange on
    * (bucket, shard); the batch aggregate reuses that partitioning
    * ((bucket, shard) ⊂ grouping keys). A batch never mixes shards —
    * exactly how a distributed batcher runs anyway: each output writer
    * owns a shard and pads within it. */
  def packLengthBucketed(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      maxBatch: Int,
      shards: Int = 16): DataFrame = {
    require(maxBatch > 0, s"maxBatch must be positive: $maxBatch")
    require(shards > 0, s"shards must be positive: $shards")
    val bucket = when(col(tokCol) === 1, 0L)
      .otherwise(length(bin(col(tokCol) - 1)).cast("long")).as("bucket")
    val w = Window.partitionBy("bucket", "shard").orderBy(idCol)
    df.filter(col(tokCol) >= 1)
      .select(col(idCol), col(tokCol), bucket,
        Hashing.md5Bucket(col(idCol), shards).cast("long").as("shard"))
      .withColumn("batch", floor((row_number().over(w) - 1) / maxBatch).cast("long"))
      .groupBy("bucket", "shard", "batch")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokCol)).as("n_tokens"),
        max(col(tokCol)).as("max_tokens"),
        min(col(idCol)).as("first_doc"),
        round(sum(col(tokCol)) /
          (count(lit(1)) * pow(lit(2.0), col("bucket").cast("double"))), 6)
          .as("pad_efficiency"))
  }

  /** Snapshot diff — the provenance operator that pairs with the
    * corpus manifest: given two versions of a corpus, report per
    * stratum how many documents were added, removed, changed
    * (same id, different content digest) and unchanged. This is the
    * record a data-card release publishes next to its manifest, and
    * the guardrail a retrain-decision reads ("2% of source X changed
    * since the last build").
    *
    * Scale shape: each side reduces to scalar (id, stratum, digest)
    * AT THE SCAN — document text never crosses an exchange; the
    * full-outer join is keyed by id, and the per-stratum rollup is an
    * aggregate over four 0/1 flags. */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      idCol: String,
      payloadCol: String,
      strataCol: String): DataFrame = {
    def keyed(df: DataFrame, side: String) = df.select(
      col(idCol).as(s"id_$side"), col(strataCol).as(s"src_$side"),
      Hashing.rowDigest(col(idCol), col(payloadCol)).as(s"h_$side"))
    keyed(before, "a")
      .join(keyed(after, "b"), col("id_a") === col("id_b"), "full_outer")
      .select(coalesce(col("src_a"), col("src_b")).as("source"),
        when(col("id_a").isNull, 1L).otherwise(0L).as("added"),
        when(col("id_b").isNull, 1L).otherwise(0L).as("removed"),
        when(col("id_a").isNotNull && col("id_b").isNotNull &&
          col("h_a") =!= col("h_b"), 1L).otherwise(0L).as("changed"),
        when(col("h_a") === col("h_b"), 1L).otherwise(0L).as("unchanged"))
      .groupBy("source")
      .agg(sum("added").as("n_added"), sum("removed").as("n_removed"),
        sum("changed").as("n_changed"), sum("unchanged").as("n_unchanged"))
  }

  /** Deterministic per-stratum keep predicate: row survives when its
    * md5 bucket (0..99 from the id) is below the stratum's percentage
    * rate. Hash-based rather than random so (a) reruns and retried
    * tasks make identical decisions — no RNG seeds to thread through a
    * cluster — and (b) the sample is a stable subset: raising a rate
    * only ADDS documents, it never swaps them (monotone bucket cut).
    * This is how corpora rebalance language/source mixes at scale.
    */
  def stratumKeep(
      id: Column,
      stratum: Column,
      ratesPct: Map[String, Int],
      defaultPct: Int): Column = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(r => r >= 0 && r <= 100),
      s"rates must be percentages in 0..100: $ratesPct default=$defaultPct")
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(stratum === k, v).otherwise(acc)
    }
    Hashing.md5Bucket(id, 100) < rate
  }

  /** Boilerplate line removal (the CCNet/C4 line-dedup stage): lines
    * that recur across ≥ `minDocs` documents — nav menus, footers,
    * cookie banners — are struck from every document; unique prose
    * survives. Two passes, build-stats → broadcast-apply (the vocab
    * pattern):
    *
    *  1. line-frequency pass: explode to (doc_id, line-md5) SCALARS —
    *     line text never crosses the exchange — and count distinct
    *     docs per hash;
    *  2. apply pass: each doc filters and reassembles its own lines
    *     scan-side — zero shuffles, no reassembly exchange carrying
    *     text. Up to `broadcastAbove` distinct boiler lines the hash
    *     set rides into codegen as a literal array (probe is a short
    *     linear scan — cheapest at that size); above it, the set ships
    *     as an executor-lifetime BROADCAST probed O(1) per line
    *     ([[graft.functions.BroadcastSetProbe]]) — semantically a
    *     broadcast left-semi join on the line hash, kept scan-side
    *     because a physical join would explode the text and pay a
    *     reassembly exchange carrying it. `maxBoilerLines` still
    *     bounds the set loudly — boilerplate is few DISTINCT strings
    *     by nature, however many copies exist.
    *
    * Emits (idCol, clean_text, n_removed). A document that was all
    * boilerplate comes back as the empty string, not a dropped row. */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      sep: String, minDocs: Int, maxBoilerLines: Int = 100000,
      broadcastAbove: Int = 1000): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val sepLit = java.util.regex.Pattern.quote(sep)
    val lineHashes = df
      .select(col(idCol), explode(split(col(textCol), sepLit)).as("line"))
      .select(col(idCol), md5(col("line")).as("lh"))
      .groupBy("lh").agg(countDistinct(col(idCol)).as("n"))
      .filter(col("n") >= minDocs)
      .select("lh").collect().map(_.getString(0))
    require(lineHashes.length <= maxBoilerLines,
      s"${lineHashes.length} boilerplate lines exceed maxBoilerLines=$maxBoilerLines " +
        "— raise the bound or minDocs")
    val linesArr = split(col(textCol), sepLit)
    val kept =
      if (lineHashes.isEmpty) linesArr
      else if (lineHashes.length <= broadcastAbove) {
        val boiler = array(lineHashes.sorted.map(lit): _*)
        filter(linesArr, l => !array_contains(boiler, md5(l)))
      } else {
        val bc = graft.functions.BroadcastSetProbe
          .broadcastSet(df.sparkSession, lineHashes)
        filter(linesArr, l => !graft.functions.BroadcastSetProbe.probe(md5(l), bc))
      }
    df.select(col(idCol),
      array_join(kept, sep).as("clean_text"),
      (size(linesArr) - size(kept)).cast("long").as("n_removed"))
  }

  /** Deterministic epoch shuffle: the reproducible global training
    * order a data loader needs — a fresh pseudo-random permutation per
    * (seed, epoch), identical on every rerun/retry, with NO RNG state
    * and NO global sort. Each doc's shuffle key is md5(seed:epoch:id);
    * its position is (shard, pos): shard = the key's top byte modulo
    * `shards` (so consumers stream shards in order to see the full
    * permutation), pos = rank within the shard. The only exchange is
    * the shard-keyed window — shard count is the caller's reader
    * parallelism, exactly the packConcatChunk scale shape. A new epoch
    * reshuffles everything (the key changes), while the same
    * (seed, epoch) is bit-stable forever — which is what makes
    * mid-training resumption and data-order debugging possible. */
  def epochOrder(df: DataFrame, idCol: String, seed: Long, epoch: Int,
      shards: Int = 8): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    val key = md5(concat(lit(s"$seed:$epoch:"), col(idCol).cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("shuffle_key"), col(idCol))
    df.select(col(idCol), key.as("shuffle_key"))
      .withColumn("shard",
        (conv(substring(col("shuffle_key"), 1, 2), 16, 10).cast("long") % shards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Count-min sketch of the corpus token stream: `depth` independent
    * hash rows × `width` counters, each token incrementing one counter
    * per row (bucket = md5-bucket of "d:token"). The sketch is
    * depth×width scalar counters REGARDLESS of corpus size — the
    * bounded-memory frequency summary that replaces a vocabulary-sized
    * exact count table at stream/100 TB scale — and it MERGES by plain
    * addition: sketches built per partition, per shard, or per
    * micro-batch sum into the corpus sketch (the exchange here carries
    * only (d, bucket) pairs, map-side combined down to ≤ depth×width
    * rows per task).
    *
    * Unlike the HLL/KLL sketch rows (approximate AND engine-seeded,
    * so spec-bounded rather than oracle-bound), the hash rows here are
    * md5-derived and deterministic: DuckDB recomputes the identical
    * sketch, so estimates are hash-checkable to the last count. The
    * estimate guarantee is one-sided — est ≥ true count always, with
    * overestimates bounded by collision mass (CorpusOpsSpec pins
    * both). */
  def countMinSketch(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in 1..16: $depth")
    hashRows(tokenStream(df, textCol), depth, width)
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
  }

  /** The (d, bucket) hash-row explosion shared by sketch build and
    * estimate: one output row per hash row d, bucket = md5("d:token")
    * mod width. */
  private[graft] def hashRows(tokens: DataFrame, depth: Int, width: Int): DataFrame =
    tokens.select(col("*"), explode(array((0 until depth).map { d =>
      struct(lit(d).as("d"),
        Hashing.md5Bucket(concat(lit(s"$d:"), col("token")), width).as("bucket"))
    }: _*)).as("h"))
      .select(col("token"), col("h.d").as("d"), col("h.bucket").as("bucket"))

  /** The corpus token stream as (token) rows — sketch input and
    * heavy-hitter candidate source. */
  private[graft] def tokenStream(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.text.TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")

  /** Rank candidate tokens by count-min estimate against an
    * already-built sketch: each candidate's estimate is the MIN of its
    * `depth` counters, ranked (est DESC, token) and cut to k. The
    * sketch is depth×width BY CONSTRUCTION, so it broadcasts — the
    * candidate stream never shuffles for the join (PlanAuditSpec pins
    * broadcast-only), and the one exchange carries (token, est)
    * scalars for the ranking. Accepting the sketch as an input is what
    * lets a streaming-maintained sketch feed the same ranking
    * (StreamingJobs.streamingCmHeavyHitters). */
  def cmHeavyHittersFrom(sketch: DataFrame, candidates: DataFrame, k: Int,
      depth: Int = 4, width: Int = 256): DataFrame =
    hashRows(candidates.distinct(), depth, width)
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy("token").agg(min("c").as("est_count"))
      .orderBy(col("est_count").desc, col("token").asc)
      .limit(k)

  /** Heavy hitters by count-min estimate, end to end: build the sketch
    * over the corpus, then rank its distinct tokens (vocabulary-sized
    * candidate set — the same driver-free shape as the exact top-k);
    * the sketch's win is that the FREQUENCY table behind the ranking
    * is depth×width, not vocabulary-sized, and already merged across
    * shards/batches.
    *
    * Cost note: this convenience form scans the corpus TWICE (sketch
    * pass + candidate pass) — unavoidable when the candidates come
    * from the corpus itself, and materializing the token stream to
    * avoid it would cost more than the rescan. At scale, pass an
    * externally-known candidate set (query vocabulary, prior epoch's
    * hitters) to cmHeavyHittersFrom and only the sketch pass touches
    * the corpus. */
  def cmHeavyHitters(df: DataFrame, textCol: String, k: Int,
      depth: Int = 4, width: Int = 256): DataFrame =
    cmHeavyHittersFrom(countMinSketch(df, textCol, depth, width),
      tokenStream(df, textCol), k, depth, width)

  /** Temperature-scaled mixing shares (the multilingual-rebalance knob:
    * p_i ∝ n_i^α): per-stratum token counts become sampling shares
    * raised to temperature `alpha` and renormalized — α = 1 keeps the
    * natural mix, α = 0 is uniform, and the published multilingual
    * recipes sit between (α ≈ 0.3 upweights tail languages without
    * drowning the head). Emits the knob table a mix designer reads:
    * natural share, tempered share, and the boost each stratum gets —
    * the output feeds mixRates/repeatRates as target weights.
    *
    * Scale shape: one partial+final aggregate keyed by the stratum
    * column reduces the corpus to a strata-sized frame; the two
    * normalizing totals are a 1-row aggregate of THAT frame,
    * broadcast back (the quality-calibrate derive-then-apply shape).
    * Nothing corpus-sized crosses more than the one stratum exchange,
    * and nothing is collected. Shares round to 6 dp (f64 pow agrees
    * across engines well inside that) and boost to 4. */
  def temperatureShares(df: DataFrame, strataCol: String, textCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1]: $alpha")
    val strata = df
      .select(col(strataCol), graft.text.TextOps.tokenCount(col(textCol)).as("tok"))
      .groupBy(strataCol)
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
    val totals = strata.agg(
      sum("n_tokens").as("tt"),
      sum(pow(col("n_tokens"), alpha)).as("tp"))
    strata.crossJoin(broadcast(totals))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tt"), 6).as("raw_share"),
        round(pow(col("n_tokens"), alpha) / col("tp"), 6).as("temp_share"),
        round((pow(col("n_tokens"), alpha) / col("tp")) /
          (col("n_tokens") / col("tt")), 4).as("boost"))
  }

  /** Per-source Jensen–Shannon divergence from the corpus-wide unigram
    * distribution — the mixture-monitoring metric (is source X's token
    * distribution drifting from the blend it feeds?). JS rather than
    * KL because sources miss corpus vocabulary (KL's q=0 blows up);
    * JS is bounded in [0, ln 2] and symmetric-safe with zeros.
    *
    * Scale shape — the naive form joins every source against the FULL
    * corpus vocabulary (V×S rows; V is web-corpus vocabulary, easily
    * 10⁸). This implementation never builds it: for tokens ABSENT from
    * a source, p = 0 and the JS term collapses to ½·q·ln 2, so the
    * absent mass sums in closed form as ½·ln 2·(1 − Σ_present q) and
    * only the per-(source, token) rows that already exist are ever
    * computed. Exchanges carry scalar (source, token, count) rows: one
    * keyed by (source, token), a re-aggregate keyed by token for the
    * global counts, the token-keyed join between them, and a final
    * strata-sized reduce. The per-source totals frame is strata-sized
    * and broadcast; the corpus total is 1 row.
    *
    * Emits (source, n_tokens, vocab, covered_mass, js): covered_mass =
    * share of corpus token mass whose types the source has seen (a
    * legible coverage diagnostic alongside the divergence). */
  def jsDivergenceBySource(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val ln2 = math.log(2.0)
    val st = df
      .select(col(sourceCol), explode(graft.text.TextOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(sourceCol, "token").agg(count(lit(1)).as("c"))
    val global = st.groupBy("token").agg(sum("c").as("gc"))
    val perSource = st.groupBy(sourceCol).agg(sum("c").as("n"))
    val total = st.agg(sum("c").as("nn"))
    val p = col("c") / col("n")
    val q = col("gc") / col("nn")
    val m = (p + q) / 2
    st.join(global, "token")
      .join(broadcast(perSource), sourceCol)
      .crossJoin(broadcast(total))
      .select(col(sourceCol), col("n"),
        (p * log(p / m) / 2 + q * log(q / m) / 2).as("term"),
        q.as("qmass"))
      .groupBy(col(sourceCol), col("n")) // n is constant per source
      .agg(
        count(lit(1)).as("vocab"),
        round(sum("qmass"), 6).as("covered_mass"),
        round(sum("term") + lit(ln2 / 2) * (lit(1.0) - sum("qmass")), 6).as("js"))
      .select(col(sourceCol), col("n").as("n_tokens"), col("vocab"),
        col("covered_mass"), col("js"))
  }

  /** Global exact paragraph dedup (the C4/RefinedWeb exact-span stage,
    * complement of [[removeBoilerplateLines]]): every paragraph that
    * recurs ANYWHERE in the corpus survives only at its first
    * occurrence (lowest (id, position)); later copies are struck.
    * Where boilerplate removal kills the few distinct strings that
    * recur in ≥ minDocs docs (a collected, bounded set), the duplicate
    * set here is CORPUS-SIZED — mirrored press releases, syndicated
    * articles, quoted blocks — so nothing collects and the keep-set
    * flows back as a join. Paragraphs shorter than `minLen` chars are
    * exempt (blank lines and "---" separators are not content to
    * dedup).
    *
    * Scale shape: the occurrence marks are SCALAR (id, idx, md5) rows
    * — paragraph text never enters the first-occurrence window, whose
    * key (the paragraph hash) has corpus-scale cardinality, so
    * parallelism scales with data. The kept positions fold to one
    * int-array row per doc, and full text crosses exactly ONE exchange
    * — the id-keyed reassembly join — which is inherent: the keep-set
    * is corpus-sized, so no broadcast exists. Reassembly filters the
    * scan-side line array by kept index (per-doc cost lines ×
    * |kept|, bounded by a document's own length).
    *
    * Emits (idCol, clean_text, n_removed); a doc that was entirely
    * duplicate text comes back empty, not dropped. */
  def dedupParagraphsGlobal(df: DataFrame, idCol: String, textCol: String,
      sep: String, minLen: Int = 5): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1: $minLen")
    val sepLit = java.util.regex.Pattern.quote(sep)
    val linesArr = split(col(textCol), sepLit)
    val marks = df
      .select(col(idCol), posexplode(linesArr).as(Seq("idx", "line")))
      .filter(length(col("line")) >= minLen)
      .select(col(idCol), col("idx"), md5(col("line")).as("lh"))
    val w = Window.partitionBy("lh").orderBy(col(idCol), col("idx"))
    val keptIdx = marks
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("idx"))).as("keep"))
    df.join(keptIdx, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("keep"), array().cast("array<int>")).as("keep"),
        linesArr.as("lines"))
      .select(col(idCol),
        filter(col("lines"), (l, i) =>
          length(l) < minLen || array_contains(col("keep"), i)).as("kept"),
        size(col("lines")).as("n_lines"))
      .select(col(idCol),
        array_join(col("kept"), sep).as("clean_text"),
        (col("n_lines") - size(col("kept"))).cast("long").as("n_removed"))
  }
}
