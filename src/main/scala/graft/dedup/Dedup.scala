package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-training-data surface (builder
  * brief: exact, MinHash-LSH, SimHash, n-gram Jaccard). The reference's
  * only dedup is URL set-insert (SURVEY §2.4 D1, resource.go:77-87);
  * these operators generalize that to content-level identity, the way a
  * pretraining pipeline needs.
  *
  * Scale design (the part that matters at 100 TB):
  *  - Exact dedup is a hash-groupBy on md5(text) — partial+final
  *    aggregation, one shuffle on the digest, never on the text itself.
  *  - Near-dup is MinHash-LSH: signatures are per-row column work
  *    (codegen'd, no shuffle); candidate generation explodes b band
  *    hashes per doc and self-joins on (band, band_hash) — a shuffle
  *    hash join on a compound key whose buckets are collision groups,
  *    NEVER an all-pairs cross join. Verification runs true Jaccard
  *    only on the candidate pairs.
  *  - SimHash gives a 32-bit sketch per document; hamming distance is a
  *    cheap scalar compare usable as a blocking key (prefix buckets).
  * All hash math is md5-based built-ins so the DuckDB oracle recomputes
  * every value (DuckDB has no sha1; md5/sha256 are the shared digests).
  */
object Dedup {

  /** Distinct word n-gram shingles of a single-space-tokenized text, as
    * an array column. NOTE: higher-order-function expressions run
    * interpreted — fine for small/targeted use (the trigram pairwise
    * query, candidate-pair verification); the LSH pipeline's corpus
    * pass uses the native MinHashBands kernel instead
    * (graft.functions.TextKernels, equivalence pinned by
    * TextExpressionsSpec). */
  def wordShingles(text: Column, n: Int = 2): Column = {
    val w = split(text, " ")
    // guard: sequence(0, negative) would run DESCENDING and fabricate
    // partial shingles for docs shorter than n tokens — such docs have
    // no n-grams (matching explodedShingles and the oracle's range())
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => get(w, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: `numHashes` salted-md5 minima over the shingle
    * set. Composed REFERENCE form (interpreted) — the LSH pipeline uses
    * the native MinHashBands kernel; TextExpressionsSpec pins the two
    * equivalent. */
  def minhashSignature(shingles: Column, numHashes: Int = 12): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** LSH band hashes: the signature split into `bands` bands of
    * `rowsPerBand`, each band re-hashed. Two docs collide in a band iff
    * that band of their signatures is identical.
    *
    * Defaults are 4 bands × 3 rows (s-curve threshold (1/4)^(1/3) ≈
    * 0.63): on a low-entropy corpus (shared vocabulary — exactly what a
    * pretraining crawl looks like) 2-row bands collide on the two
    * globally-most-common shingle minima and buckets grow to a large
    * fraction of the corpus, which makes the candidate join quadratic.
    * 3-row bands need three shared minima — discriminative even when
    * vocabulary overlaps heavily. */
  def bandHashes(sig: Column, bands: Int = 4, rowsPerBand: Int = 3): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("", (0 until rowsPerBand).map(r => get(sig, b * rowsPerBand + r)): _*)))

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact-dedup survivors: one keeper row (min id) per distinct text
    * digest, with the duplicate count. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash-LSH near-duplicate pairs over (idCol, textCol):
    * shingle → sign → band → bucket-join → Jaccard-verify. Returns
    * (id_a, id_b, jaccard) for verified pairs with jaccard >= threshold.
    * The only shuffles are the (band, band_hash) join and the two
    * id-equi joins that re-attach shingles for verification.
    *
    * `maxBucketSize` is the skew guard that makes the candidate join
    * survive scale: a bucket holding a large fraction of the corpus is
    * a non-discriminative collision (its band carries no similarity
    * signal) but would contribute O(bucket²) candidate pairs in ONE
    * join partition. Oversized buckets are dropped; genuinely similar
    * pairs still collide in their other, discriminative bands. This is
    * the LSH analog of salting a skewed join key.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, numHashes: Int = 12, bands: Int = 4,
      maxBucketSize: Int = 64, partitionsHint: Option[Int] = None): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0 && numHashes / bands >= 1,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands) — " +
        "integer division would silently drop signature hashes or empty every band")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // Shingle → sign → band in ONE per-row native kernel
    // (graft.functions.MinHashBands): no shingle rows, no window, no
    // distinct, no signature shuffle, no persist. The only data that
    // ever shuffles after the kernel is (doc_id, band, band_hash) —
    // three scalar columns. (The round-2 row-form pipeline shuffled the
    // exploded shingle set three times and needed an unbounded persist
    // to avoid recomputing it.)
    //
    // The repartition spreads the CPU-heavy kernel across all cores
    // when (and ONLY when) the input arrives underpartitioned — a small
    // corpus lands as one parquet split, which would pin the digest
    // work to one thread. At cluster scale the scan already has
    // thousands of splits, so an unconditional repartition would
    // shuffle every text byte per invocation for nothing (round-3
    // audit); the gate keeps the shuffle a small-input-only fixup.
    // The probe reads the partition count from the INTERNAL-row plan
    // (`executedPlan.execute()`), not `base.rdd` — the latter grafts a
    // whole Row-conversion lineage onto a second physical plan just to
    // read a count (round-4 advice). Callers that already know their
    // parallelism (e.g. a chained-mutant union whose plan is expensive
    // to build twice) skip the probe entirely via `partitionsHint`.
    val sc = df.sparkSession.sparkContext
    val inputParts = partitionsHint.getOrElse(
      base.queryExecution.executedPlan.execute().getNumPartitions)
    val spread =
      if (inputParts < sc.defaultParallelism)
        base.repartition(sc.defaultParallelism, col("doc_id"))
      else base
    val banded = spread.select(col("doc_id"),
      posexplode(graft.functions.GraftFunctions.minhashBands(
        col("text"), 2, numHashes, bands)).as(Seq("band", "bh")))
    val sized = banded
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")))
      .filter(col("bsz") <= maxBucketSize)
      .select("doc_id", "band", "bh")
    val cand = sized.as("a")
      .join(sized.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Verification on the candidate pairs ONLY: re-attach the two texts
    // (candidates are a tiny fraction of the corpus — AQE broadcasts
    // them, so the corpus side never shuffles) and score each pair with
    // the fused ShingleJaccard kernel — one codegen'd pass per pair.
    // (The composed wordShingles+jaccard HOF form is bit-equivalent but
    // interpreted: round-4 profiling measured it at ~5 s for 3k pairs,
    // dominating the whole query; TextExpressionsSpec pins the
    // equivalence.)
    cand
      .join(base.select(col("doc_id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(base.select(col("doc_id").as("id_b"), col("text").as("text_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.GraftFunctions.shingleJaccard(
          col("text_a"), col("text_b"), 2).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Recall/precision report for the MinHash-LSH near-dup path — the
    * eval a text-dedup deployment runs BEFORE trusting a (numHashes,
    * bands, cap) config (the `bandedRecallReport` analog for the text
    * family, completing the measure-before-trust story across every
    * dedup family). For each Jaccard threshold t: `n_true` = ALL pairs
    * with true shingle Jaccard ≥ t (exact all-pairs baseline),
    * `n_found` = LSH candidate pairs (bucket cap INCLUDED — the
    * production config is what gets measured) with Jaccard ≥ t,
    * `recall = n_found / n_true`, plus the candidate volume and
    * verification precision. MinHash banding's S-curve means recall
    * falls off steeply below the config's design threshold (r=3, b=4:
    * P(candidate | j=0.5) ≈ 0.41) — this report puts the measured
    * number next to the theory. The exact baseline is O(n²) BY DESIGN:
    * an EVAL operator, run over a drawn sample at corpus scale (the
    * ann_recall_report contract); the production path stays banded. */
  def lshRecallReport(df: DataFrame, idCol: String, textCol: String,
      thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8),
      numHashes: Int = 12, bands: Int = 4,
      maxBucketSize: Int = 64): DataFrame = {
    require(thresholds.nonEmpty, "no thresholds to evaluate")
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val th = spark.createDataFrame(
      spark.sparkContext.parallelize(thresholds.map(Tuple1(_)), 1))
      .toDF("threshold")
    val a = base.select(col("doc_id").as("id_a"), col("text").as("text_a"))
    val b = base.select(col("doc_id").as("id_b"), col("text").as("text_b"))
    // all-pairs as a broadcast nested-loop (the eval sample is bounded
    // by contract), never a shuffle cartesian
    val exact = a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(graft.functions.GraftFunctions.shingleJaccard(
        col("text_a"), col("text_b"), 2).as("score"))
    // threshold 0.0 = every verified candidate, so one banding pass
    // serves every threshold
    val cand = nearDupPairs(df, idCol, textCol, threshold = 0.0,
      numHashes, bands, maxBucketSize).select(col("jaccard").as("score"))
    graft.operators.RecallEval.aggregate(th, exact, cand,
      hit = _ >= _, config = Seq("bands" -> lit(bands)))
  }

  /** Cross-document repeated SUBSTRING detection — the character-level
    * dedup that document-level identity misses (published ablations
    * show long verbatim spans shared across otherwise-distinct pages —
    * boilerplate, licenses, syndicated text — measurably hurt trained
    * models; the operator a "dedup at the substring level" pass needs).
    *
    * Fingerprint windows: every `stride`-aligned character window of
    * length `window` hashes to md5; two documents sharing ANY window
    * fingerprint share a ≥`window`-char run up to stride alignment.
    * Returns (id_a, id_b, n_shared) = distinct shared fingerprints per
    * pair.
    *
    * Scale shape: windows explode scan-side (stride-aligned, so
    * len/stride rows per doc — bounded amplification, tunable);
    * everything that shuffles is scalar (doc_id, fp) after a per-doc
    * distinct. The fingerprint join is hash-partitioned with
    * nearDupPairs' oversize-bucket guard transplanted: a fingerprint
    * shared by more than `maxBucketSize` documents is boilerplate (its
    * pairs are quadratic and its signal is "this is template text",
    * better handled by a frequency report than a pair list) and is
    * dropped. */
  /** Asymmetric CONTAINMENT near-dup: pairs where the smaller
    * document's shingle set is (mostly) a subset of the larger's —
    * containment(A→B) = |S(A)∩S(B)| / |S(A)|. This is the duplication
    * Jaccard structurally misses: an excerpt quoted inside a 100×
    * longer article scores Jaccard ≈ 1%, containment ≈ 100% — and
    * excerpt/quote/chunk duplication is a dominant pattern in web
    * training corpora.
    *
    * Scale shape: an INVERTED SHINGLE INDEX, not pairwise — each doc
    * explodes to (doc_id, md5(shingle)) scalars (text never crosses an
    * exchange past the scan), shingles shared by fewer than 2 or more
    * than `maxDf` documents are dropped (singletons pair with nothing;
    * ultra-common shingles are boilerplate whose pairs are quadratic —
    * the nearDupPairs bucket-guard argument, applied to document
    * frequency), and co-occurrence counts come from a hash self-join
    * within each surviving shingle: pair cardinality is bounded by
    * maxDf² per shingle, never corpus². The df cap is part of the
    * operator's SEMANTICS (the oracle applies the same cap): dropped
    * boilerplate shingles still count in the denominator, so a doc
    * made mostly of boilerplate cannot fake containment. Emits
    * (contained_id, container_id, containment) with the smaller
    * shingle set as the contained side (ties → lower id). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxDf: Int = 64): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2: $maxDf")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // Native shingle kernel (graft_word_shingles ≡ the composed
    // wordShingles, TextExpressionsSpec-pinned); no spread repartition
    // — the kernel pass is cheap enough serially that shuffling text
    // to parallelize it would break the "no exchange carries document
    // text" structural pin for nothing (the property that holds the
    // operator together at 100 TB).
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val sh = base.select(col("doc_id"),
        explode(graft.functions.GraftFunctions.wordShingles(col("text"), n)).as("s"))
      .select(col("doc_id"), md5(col("s")).as("fp"))
    // Distinct-shingle count per doc via the NATIVE shingle-stats
    // kernel (one codegen'd pass, no explode) — NOT a groupBy over the
    // exploded frame: that consumer re-ran the whole interpreted
    // wordShingles lineage a second time (plans don't share diamond
    // subtrees; guide §1.2 "don't compute things you throw away").
    // Equal by construction: wordShingles is array_distinct'd, and
    // shingleStats[2] IS the distinct n-gram count (the oracle's
    // len(sh3)). Docs with < n tokens have no shingles and never match.
    val sizes = base.select(col("doc_id"),
      element_at(graft.functions.GraftFunctions.shingleStats(col("text"), n), 2)
        .as("n_sh"))
    // df cap as a count-over-fp window (the substringSpanPairs/
    // nearDupPairs bucket-guard shape): ONE fp exchange that the
    // self-join below reuses for both sides, where the former
    // groupBy(fp)+join-back re-ran the kernel lineage for the index
    // branch — the third ~4 s kernel stage in the sf0.1 profile.
    val idx = sh
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("doc_id", "fp")
    val matches = idx.as("a")
      .join(idx.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("m"))
    matches
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .select(
        when(col("na") < col("nb") ||
          (col("na") === col("nb") && col("id_a") < col("id_b")), col("id_a"))
          .otherwise(col("id_b")).as("contained_id"),
        when(col("na") < col("nb") ||
          (col("na") === col("nb") && col("id_a") < col("id_b")), col("id_b"))
          .otherwise(col("id_a")).as("container_id"),
        (col("m").cast("double") / least(col("na"), col("nb"))).as("c"))
      .filter(col("c") >= threshold) // threshold on the RAW ratio; the
      // rounding below is presentation (cross-engine f64 agreement)
      .select(col("contained_id"), col("container_id"),
        round(col("c"), 6).as("containment"))
  }

  def substringSpanPairs(df: DataFrame, idCol: String, textCol: String,
      window: Int = 100, stride: Int = 50, maxBucketSize: Int = 64): DataFrame = {
    require(window >= 1 && stride >= 1, s"window/stride must be positive: $window/$stride")
    val text = col(textCol)
    // stride-aligned offsets 0, stride, … while offset + window <= len;
    // docs shorter than one window have none (the sequence() descending
    // pitfall wordShingles documents)
    val nWin = floor((length(text) - window) / stride) + 1
    val fps = df
      .select(col(idCol).as("doc_id"), text.as("text"),
        explode(when(length(text) >= window, sequence(lit(0L), nWin - 1))
          .otherwise(array().cast("array<bigint>"))).as("i"))
      .select(col("doc_id"),
        md5(col("text").substr((col("i") * stride + 1).cast("int"), lit(window))).as("fp"))
      .distinct()
    val sized = fps
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("bsz") <= maxBucketSize)
      .select("doc_id", "fp")
    sized.as("a")
      .join(sized.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Distance-1 deletion neighborhood of a string: the string itself
    * plus every one-character-deleted variant, distinct. Two strings
    * with levenshtein ≤ 1 ALWAYS share at least one member (equal →
    * the string itself; b deletes a char of a → b is in a's set;
    * substitution → deleting the differing position from both yields
    * the same string; insertion is deletion mirrored) — the symmetric-
    * delete blocking scheme, so blocking on these keys has recall 1.0
    * for edit distance ≤ 1. */
  def deletionKeys(name: Column): Column =
    array_union(
      array(name),
      // guard: sequence(1, 0) runs DESCENDING for an empty string and
      // would fabricate junk keys (same pitfall wordShingles documents)
      when(length(name) >= 1,
        transform(sequence(lit(1), length(name)),
          i => concat(name.substr(lit(1), i - 1),
            name.substr(i + 1, length(name) - i))))
        .otherwise(array().cast("array<string>")))

  /** Entity-resolution candidate pairs at edit distance ≤ 1: records
    * blocked on (blockCol, deletion-neighborhood key), verified with
    * levenshtein. Returns (id_a, id_b, dist).
    *
    * Scale shape: the block key's cardinality GROWS with the data
    * (keys are name-derived, near-distinct), unlike a constant
    * attribute block (e.g. nation — N/25 rows per block forever, so
    * within-block pairwise work is O((N/25)²): the round-5 wart this
    * operator replaces). Each record explodes into length+1 scalar
    * keys; the one exchange carries (id, name, block, key) strings.
    * `maxBlockSize` is nearDupPairs' skew guard transplanted: a key
    * shared by more than `maxBlockSize` records is non-discriminative
    * boilerplate (empty names, template values) contributing O(block²)
    * pairs in one task — dropped. A pair whose OTHER shared keys are
    * rarer still survives; records whose every key is over-cap (near-
    * identical template names at scale) lose their pairs by design —
    * the same precision-for-boundedness trade the guard makes in the
    * LSH path (DedupSpec pins both the drop and the survival). */
  def editBlockedPairs(records: DataFrame, idCol: String, nameCol: String,
      blockCol: String, maxBlockSize: Int = 64): DataFrame = {
    // two projections: deriving bk in the same select that aliases
    // `name` would resolve the lambda's column laterally against the
    // fresh alias — an unexecutable LateralColumnAliasReference inside
    // the higher-order function (Spark internal error)
    val base = records.select(col(idCol).as("id"), col(nameCol).as("name"),
      col(blockCol).as("blk"))
    // native kernel (graft_deletion_keys ≡ the composed deletionKeys,
    // KernelPropertySpec-pinned) — the composed transform ran
    // interpreted per record (round-16 profile: the bulk of
    // dedup_entity_fuzzy's 1.7 s)
    graft.functions.GraftFunctions.register(records.sparkSession)
    val keys = base.select(col("id"), col("name"), col("blk"),
      explode(graft.functions.GraftFunctions.deletionKeys(col("name"))).as("bk"))
    val sized = keys
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("blk", "bk")))
      .filter(col("bsz") <= maxBlockSize)
      .select("id", "name", "blk", "bk")
    sized.as("a")
      .join(sized.as("b"),
        col("a.blk") === col("b.blk") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .filter(col("dist") <= 1)
  }

  /** 32-bit SimHash over whitespace tokens as a '0'/'1' bit string.
    * Per token, bit i of md5 (hex-digit decode, i div 4 picks the
    * digit, 3 - i mod 4 the bit) votes +1/-1; the sign of the vote sum
    * is the sketch bit. Entirely builtin expressions (nested
    * higher-order functions) so it runs inside codegen and the oracle
    * can recompute it. */
  def simhash(textCol: String, bits: Int = 32): Column = expr(
    s"""array_join(transform(sequence(0, ${bits - 1}), i ->
       |  CASE WHEN aggregate(split($textCol, ' '), 0,
       |    (acc, t) -> acc + CASE WHEN
       |      (shiftright(instr('0123456789abcdef', substring(md5(t), 1 + (i div 4), 1)) - 1,
       |                  3 - i % 4) & 1) = 1
       |      THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END), '')""".stripMargin)

  /** SimHash as a codegen'd aggregation (the form the queries use):
    * explode tokens, hash each ONCE, emit per-bit ±1 votes as `bits`
    * sum aggregates, sign → bit string. Identical output to the
    * `simhash` column expression (DedupSpec pins the equivalence), but
    * stays inside WholeStageCodegen with map-side partial sums — the
    * interpreted HOF form measured ~8 s for 550 docs at 32 bits. */
  def simhashAgg(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val tok = df
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("t"))
      .withColumn("h", md5(col("t")))
    val votes = (0 until bits).map { i =>
      val bit = expr(
        s"shiftright(instr('0123456789abcdef', substring(h, ${1 + i / 4}, 1)) - 1, ${3 - i % 4}) & 1")
      sum(when(bit === 1, 1).otherwise(-1)).as(s"b$i")
    }
    tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        concat((0 until bits).map(i =>
          when(col(s"b$i") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** Hamming distance between two equal-length bit strings. */
  def hamming(a: Column, b: Column): Column =
    size(filter(
      sequence(lit(1), length(a)),
      i => a.substr(i, lit(1)) =!= b.substr(i, lit(1)))).cast("long")

  /** Connected components over an undirected pair list — the cluster
    * step a production dedup pipeline runs AFTER near-dup pair
    * generation: transitive chains (A~B, B~C without A~C) must
    * deduplicate as ONE cluster with one keeper, which per-pair
    * dropping only approximates. Returns (doc_id, component) for every
    * vertex that appears in a pair, component = the minimum doc_id
    * reachable from it (deterministic canonical label).
    *
    * Algorithm: iterative min-label propagation (each vertex adopts the
    * smallest label among itself and its neighbors until fixpoint) —
    * the Pregel-style loop; iterations are bounded by the component
    * diameter, and near-dup graphs are overwhelmingly tiny
    * star/clique clusters, so 2–3 rounds converge. Scale per round:
    * one shuffle of (id, label) scalars keyed by vertex — edges and
    * labels hash-partition on the same key, and the label frame is
    * re-persisted per round so lineage stays flat. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).persist()
    try {
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIter) {
        // The previous label rides through the min-aggregate as a
        // second column (each id contributes exactly ONE non-null prev
        // — its own old-labels row; neighbor rows carry null), so the
        // convergence test is a filter over the frame this round
        // materializes anyway — NOT the extra shuffle join per round
        // the loop used to pay just to count changes (guide §2.4;
        // measured: one fewer job + one fewer exchange per iteration
        // across the six components-consuming queries).
        val neighborLabels = edges.join(labels, edges("dst") === labels("id"))
          .select(edges("src").as("id"), col("component"),
            lit(null).cast(labels.schema("component").dataType).as("prev"))
        val updated = labels
          .select(col("id"), col("component"), col("component").as("prev"))
          .unionAll(neighborLabels)
          .groupBy("id").agg(min("component").as("component"),
            max("prev").as("prev"))
          .persist()
        changed = updated.filter(col("component") =!= col("prev")).count()
        labels.unpersist(blocking = false)
        labels = updated
        iter += 1
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds — component " +
            "diameter exceeds the bound; raise maxIter")
      // detach the result from the persisted loop frame before released
      labels.select("id", "component").localCheckpoint(true)
        .select(col("id").as("doc_id"), col("component"))
    } finally {
      edges.unpersist(blocking = false)
      labels.unpersist(blocking = false)
      ()
    }
  }
}
