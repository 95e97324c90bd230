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
    def shingled(df: DataFrame, id: String, as: String) =
      df.select(col(id).as(as),
        explode(graft.dedup.Dedup.wordShingles(col(textCol), n)).as("sh"))
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

  /** Token-budget selection: within each stratum, keep documents in
    * `orderCol`-descending order (ties broken by `idCol`) while the
    * RUNNING token total stays within `budgetTokens` — the "best
    * documents up to N tokens per source" step of a data-mixing plan
    * (a budget is how mixes are actually specified: token counts, not
    * document counts).
    *
    * Scale shape: one hash exchange on `strataCol`, then an
    * independent per-stratum window — no global sort. Stratum
    * cardinality (sources/domains) is plan-sized, not corpus-sized;
    * a skewed giant stratum wants a shard sub-key the same way
    * `packConcatChunk`'s shardCol bounds its windows.
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
}
