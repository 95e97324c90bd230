package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based kernel ≡ composed-form equivalence over adversarial
  * inputs the fixtures never produce: consecutive/leading/trailing
  * spaces (empty tokens!), unicode, single chars, empty strings, and
  * arbitrary-sign vectors. The composed HOF forms are the executable
  * spec; the kernels must match them on EVERY input, not just corpus
  * text. scalatestplus-scalacheck isn't in the offline cache, so
  * properties sample Gen directly with fixed seeds (reproducible) and
  * batch all samples into one DataFrame per test. */
class KernelPropertySpec extends SparkSpec {

  // words incl. empty (consecutive-space artifacts), unicode, punctuation
  private val word: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumStr.map(_.take(6)),
    2 -> Gen.oneOf("héllo", "wörld", "日本語", "a", "", "x.y", "-"),
    1 -> Gen.const(""))
  private val text: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def composedHits(t: Column, lists: Seq[Seq[String]]): Column =
    ComposedForms.tokenHits(t, lists)

  private val memberLists = Seq(Seq("a", "héllo", ""), Seq("x.y", "-"))

  test("property: tokenHits ≡ composed over 200 adversarial texts") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples(text, 200).toDF("t")
    val diff = df.select(col("t"),
      GraftFunctions.tokenHits(col("t"), memberLists).as("k"),
      composedHits(col("t"), memberLists).as("c"))
      .filter(col("k") =!= col("c"))
    assert(diff.count() == 0, s"diverged on: ${diff.select("t").collect().mkString(", ")}")
  }

  test("property: minhashBands ≡ composed shingle→sign→band over adversarial texts") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // composed form has no short-doc guard — restrict to ≥2 tokens
    val df = samples(text, 120).toDF("t")
      .filter(size(split(col("t"), " ", -1)) >= 2)
    val diff = df.select(col("t"),
      GraftFunctions.minhashBands(col("t"), 2, 12, 4).as("k"),
      Dedup.bandHashes(Dedup.minhashSignature(
        Dedup.wordShingles(col("t"), 2), 12), 4, 3).as("c"))
      .filter(col("k") =!= col("c"))
    assert(diff.count() == 0, s"diverged on: ${diff.select("t").collect().mkString(", ")}")
  }

  test("property: shingleJaccard ≡ composed try_divide form over adversarial pairs") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples(Gen.zip(text, text), 150).toDF("a", "b")
    def sh(c: Column) = Dedup.wordShingles(c)
    val composed = try_divide(
      size(array_intersect(sh(col("a")), sh(col("b")))).cast("double"),
      size(array_union(sh(col("a")), sh(col("b")))))
    val diff = df.select(col("a"), col("b"),
      GraftFunctions.shingleJaccard(col("a"), col("b"), 2).as("k"),
      composed.as("c"))
      .filter((col("k").isNull =!= col("c").isNull) ||
        (col("k").isNotNull && col("k") =!= col("c")))
    assert(diff.count() == 0)
  }

  test("property: shingleStats ≡ composed split/wordShingles counts over adversarial texts") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples(text, 200).toDF("t")
    val composed = array(
      greatest(size(split(col("t"), " ", -1)) - 1, lit(0)).cast("long"),
      size(Dedup.wordShingles(col("t"), 2)).cast("long"))
    val diff = df.select(col("t"),
      GraftFunctions.shingleStats(col("t"), 2).as("k"), composed.as("c"))
      .filter(col("k") =!= col("c"))
    assert(diff.count() == 0, s"diverged on: ${diff.select("t").collect().mkString(", ")}")
  }

  /** Adversarial texts plus ASTRAL-PLANE chars (4-byte UTF-8 /
    * surrogate pairs) — the rolling-fp and deletion-key kernels walk
    * code points, which `length`/`substr` also count; a UTF-16-char
    * walk would silently split a surrogate pair. */
  private val textAstral: Gen[String] = Gen.frequency(
    3 -> text,
    1 -> text.map(t => "🚀" + t + "𝕏"),
    1 -> Gen.oneOf("🚀", "a🚀b", "🚀🚀🚀", "é🚀é"))

  test("property: rollingMinMd5 ≡ composed array_min(md5 windows) over adversarial texts") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples(textAstral, 200).toDF("t")
    Seq(1, 3, 8).foreach { k =>
      val diff = df.select(col("t"),
        GraftFunctions.rollingFp(col("t"), k).as("kk"),
        graft.text.TextOps.rollingFingerprintComposed(col("t"), k).as("c"))
        .filter(col("kk") =!= col("c"))
      assert(diff.count() == 0,
        s"k=$k diverged on: ${diff.select("t").collect().mkString(", ")}")
    }
  }

  test("property: deletionKeys kernel ≡ composed array_union form, order included") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples(textAstral, 200).toDF("t")
    val diff = df.select(col("t"),
      GraftFunctions.deletionKeys(col("t")).as("k"),
      Dedup.deletionKeys(col("t")).as("c"))
      .filter(col("k") =!= col("c")) // ordered array compare
    assert(diff.count() == 0,
      s"diverged on: ${diff.select("t").collect().mkString(", ")}")
  }

  test("property: wordGrams ≡ composed filter/zip_with gram stream, order included") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = samples(textAstral, 200).toDF("t")
    // the composed DSIR gram stream gramBuckets used to build inline
    val w = filter(split(col("t"), " ", -1), _ =!= lit(""))
    val composed = concat(w,
      when(size(w) >= 2,
        zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>")))
    val diff = df.select(col("t"),
      GraftFunctions.wordGrams(col("t")).as("k"), composed.as("c"))
      .filter(col("k") =!= col("c")) // ordered compare: unigrams then bigrams
    assert(diff.count() == 0,
      s"diverged on: ${diff.select("t").collect().mkString(", ")}")
  }

  test("property: lshBuckets ≡ per-plane HOF form over arbitrary-sign vectors") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val vec: Gen[Seq[Double]] = Gen.listOfN(8,
      Gen.oneOf(Gen.chooseNum(-5.0, 5.0), Gen.const(0.0))).map(_.toSeq)
    val df = samples(vec, 150).toDF("embedding")
    val e = graft.sim.Similarity.asDouble(col("embedding"))
    val composed = array((0 until 4).map(t =>
      graft.sim.Similarity.lshBucket(e, t, 3, 8)): _*)
    val diff = df.select(
      GraftFunctions.lshBuckets(col("embedding"), 4, 3, 8).as("k"),
      composed.as("c"))
      .filter(col("k") =!= col("c"))
    assert(diff.count() == 0)
  }
}
