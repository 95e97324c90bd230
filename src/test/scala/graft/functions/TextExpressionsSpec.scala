package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The native text kernels (TokenMemberCounts, MinHashBands) sit on the
  * hot path of seven oracle queries — this spec pins their branch-level
  * semantics the corpus-level oracle can't see: equivalence with the
  * composed HOF reference forms, interpreted-eval ≡ codegen parity, the
  * short-doc empty-array guard, multi-list/empty-list member sets, and
  * non-ASCII tokenization (the same discipline CosineSimilaritySpec
  * sets for the cosine kernel). */
class TextExpressionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    .select("doc_id", "text")

  /** Fixture docs + a one-token mutant + UTF-8 / single-token / empty
    * rows the fixture never exercises. */
  private lazy val corpus = {
    import spark.implicits._
    val idType = docs.schema("doc_id").dataType
    val extra = Seq(
      (900000L, "héllo wörld héllo wörld naïve çedilla héllo"),
      (900001L, "solo"),
      (900002L, ""))
      .toDF("doc_id", "text").select(col("doc_id").cast(idType), col("text"))
    docs.limit(40)
      .unionAll(docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 100000).cast(idType).as("doc_id"),
          concat(col("text"), lit(" xtra")).as("text")))
      .unionAll(extra)
  }

  /** Composed reference form of the memberCounts kernel (shared —
    * ComposedForms keeps both suites pinned to one executable spec). */
  private def composedHits(text: Column, lists: Seq[Seq[String]]): Column =
    ComposedForms.tokenHits(text, lists)

  private val lists = Seq(
    Seq("the", "and", "of"),      // stopword-ish
    Seq("the", "xtra", "héllo"),  // overlaps list 0, hits the mutants + UTF-8 row
    Seq.empty[String])            // empty member list → always 0

  test("tokenHits kernel ≡ composed HOF form (multi-list, empty list, UTF-8, empty doc)") {
    GraftFunctions.register(spark)
    val diff = corpus.select(
      GraftFunctions.tokenHits(col("text"), lists).as("k"),
      composedHits(col("text"), lists).as("c"))
      .filter(col("k") =!= col("c"))
    assert(diff.count() == 0)
  }

  test("minhashBands kernel ≡ composed shingle→signature→band form") {
    GraftFunctions.register(spark)
    // composed HOFs are interpreted — bounded sample, ≥2-token docs only
    // (the composed form has no short-doc guard; that branch is pinned
    // separately below)
    val sample = corpus.filter(size(split(col("text"), " ", -1)) >= 2)
    val diff = sample.select(
      GraftFunctions.minhashBands(col("text"), 2, 12, 4).as("k"),
      Dedup.bandHashes(Dedup.minhashSignature(
        Dedup.wordShingles(col("text"), 2), 12), 4, 3).as("c"))
      .filter(col("k") =!= col("c"))
    assert(diff.count() == 0)
  }

  test("short-doc guard: fewer than n tokens → EMPTY band array (never a joinable digest)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val out = Seq("", "solo").toDF("text")
      .select(GraftFunctions.minhashBands(col("text"), 2, 12, 4).as("b"))
      .collect()
    assert(out.forall(_.getSeq[String](0).isEmpty),
      "short docs must produce zero bands — md5('') digests would bucket-join all of them")
  }

  test("interpreted eval ≡ codegen path for both kernels") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val text = "the quick the lazy héllo xtra"
    // interpreted: direct Expression.eval, no codegen anywhere
    val hitsEval = TokenMemberCounts(
      Literal(UTF8String.fromString(text), StringType),
      Literal.create(lists, ArrayType(ArrayType(StringType))))
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    val bandsEval = MinHashBands(
      Literal(UTF8String.fromString(text), StringType), 2, 12, 4)
      .eval(null).asInstanceOf[ArrayData]
    val bandsEvalSeq = (0 until bandsEval.numElements())
      .map(i => bandsEval.getUTF8String(i).toString)
    // codegen: the same expressions through a projected DataFrame — the
    // text column is made non-foldable (depends on range's id) so the
    // optimizer can't constant-fold the kernels into a LocalTableScan
    val row = spark.range(1).select(
        concat(lit(text), when(col("id") === 0, lit("")).otherwise(lit(" y")))
          .as("text"))
      .select(
        GraftFunctions.tokenHits(col("text"), lists).as("h"),
        GraftFunctions.minhashBands(col("text"), 2, 12, 4).as("b"))
    assert(row.queryExecution.executedPlan.toString.contains("*("),
      "kernel fell out of whole-stage codegen")
    val r = row.head()
    assert(r.getSeq[Long](0) == hitsEval)
    assert(r.getSeq[String](1) == bandsEvalSeq)
    // and the values are the expected ones (6 tokens; 2 'the' hits on
    // list 0; 'the'×2 + 'héllo' + 'xtra' = 4 on list 1; 0 on the empty
    // list)
    assert(hitsEval == Seq(6L, 2L, 4L, 0L))
  }

  test("wordShingles kernel ≡ composed array_distinct(transform(...)) form, order included") {
    GraftFunctions.register(spark)
    // corpus covers fixture docs, UTF-8, single-token and empty rows;
    // add consecutive-space text (empty tokens kept by split(' ', -1))
    // and an exact-n-token doc (the size(w) == n boundary)
    val rows = corpus.unionAll {
      import spark.implicits._
      val idType = docs.schema("doc_id").dataType
      Seq((900010L, "a  b a  b"), (900011L, "x y z"), (900012L, "x y"))
        .toDF("doc_id", "text")
        .select(col("doc_id").cast(idType), col("text"))
    }
    Seq(1, 2, 3).foreach { n =>
      val diff = rows.select(
        GraftFunctions.wordShingles(col("text"), n).as("k"),
        Dedup.wordShingles(col("text"), n).as("c"))
        .filter(col("k") =!= col("c")) // array equality is ORDERED —
      // first-occurrence order must match, not just the set
      assert(diff.count() == 0, s"n=$n kernel drifted from composed form")
    }
    // codegen actually engaged (not CodegenFallback) — the range(1)
    // probe keeps the optimizer from constant-folding the kernel into
    // a LocalTableScan (same trick as the memberCounts codegen test)
    val probe = spark.range(1).select(
      concat(lit("a b c"), when(col("id") === 0, lit("")).otherwise(lit(" y")))
        .as("text"))
      .select(GraftFunctions.wordShingles(col("text"), 2).as("sh"))
    assert(probe.queryExecution.executedPlan.toString.contains("*("),
      "wordShingles fell out of whole-stage codegen")
    assert(probe.head().getSeq[String](0) == Seq("a b", "b c"))
  }

  test("shingleJaccard kernel ≡ composed wordShingles+jaccard form (incl. null on empty∪empty)") {
    GraftFunctions.register(spark)
    // adjacent-id pairs over the corpus, incl. the UTF-8/short/empty rows
    val pairs = corpus.as("a").join(corpus.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.text").as("ta"), col("b.text").as("tb"))
      .unionAll {
        import spark.implicits._
        Seq(("", ""), ("solo", "solo"), ("a b", "a b"), ("a b", "x y"))
          .toDF("ta", "tb")
      }
    // composed form via try_divide: under default ANSI mode a plain `/`
    // raises DIVIDE_BY_ZERO on the empty∪empty pair; the kernel's NULL
    // is the try_divide total-function semantics
    def composedJaccard(a: Column, b: Column): Column = {
      val (sa, sb) = (Dedup.wordShingles(a), Dedup.wordShingles(b))
      try_divide(size(array_intersect(sa, sb)).cast("double"), size(array_union(sa, sb)))
    }
    val diff = pairs.select(
      GraftFunctions.shingleJaccard(col("ta"), col("tb"), 2).as("k"),
      composedJaccard(col("ta"), col("tb")).as("c"))
      .filter(
        (col("k").isNull =!= col("c").isNull) ||
          (col("k").isNotNull && col("k") =!= col("c")))
    assert(diff.count() == 0)
    // null-parity branch is actually exercised: empty∪empty → NULL
    val nulls = pairs.filter(col("ta") === "" && col("tb") === "")
      .select(GraftFunctions.shingleJaccard(col("ta"), col("tb"), 2))
    assert(nulls.collect().forall(_.isNullAt(0)))
  }

  test("gated repartition: LSH pairs survive and plan shape holds on pre-partitioned input") {
    // a well-partitioned input (≥ defaultParallelism partitions) must
    // skip the corpus shuffle yet produce identical pairs
    val planted = corpus.repartition(8)
    val pairs = Dedup.nearDupPairs(planted, "doc_id", "text", threshold = 0.6)
    val found = pairs.filter(col("id_b") === col("id_a") + 100000).count()
    assert(found == 10, s"only $found/10 planted pairs found on pre-partitioned input")
  }

  test("nfc kernel: composition, ASCII identity fast path, idempotence, eval ≡ codegen") {
    GraftFunctions.register(spark)
    val decomposed = "Café naïve" // e+◌́, i+◌̈
    val composed = "Café naïve"
    // interpreted eval composes
    val evalOut = NfcNormalize(Literal(UTF8String.fromString(decomposed), StringType))
      .eval(null).asInstanceOf[UTF8String].toString
    assert(evalOut == composed)
    // ASCII fast path returns the input UNCHANGED (identity, no realloc)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(TextKernels.nfc(ascii) eq ascii)
    // idempotence: NFC(NFC(x)) == NFC(x)
    assert(TextKernels.nfc(UTF8String.fromString(evalOut)).toString == evalOut)
    // codegen path agrees with eval (non-foldable input defeats
    // constant folding, same trick as the other kernels)
    val row = spark.range(1).select(
        concat(lit(decomposed), when(col("id") === 0, lit("")).otherwise(lit(" y")))
          .as("text"))
      .select(GraftFunctions.nfc(col("text")).as("n"))
    assert(row.queryExecution.executedPlan.toString.contains("*("),
      "nfc kernel fell out of whole-stage codegen")
    assert(row.head().getString(0) == composed)
  }
}
