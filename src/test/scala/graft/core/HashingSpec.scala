package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5.1–5.2: hash determinism + order-insensitivity, and the
  * Column-expression / Scala-mirror equivalence that the execute stage
  * relies on (executor computes task paths from task_hash strings that
  * the plan stage computed as Columns).
  *
  * scalatestplus-scalacheck isn't in the offline cache, so properties
  * sample Gen directly (fixed seed sequence → reproducible). */
class HashingSpec extends SparkSpec {

  private val str: Gen[String] = Gen.asciiPrintableStr.map(_.take(40))

  /** Draw n reproducible samples from a generator. */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("collated hash is order-insensitive (hash.go:31-40 semantics)") {
    samples(Gen.zip(str, str, str)).foreach { case (a, b, c) =>
      assert(Hashing.collatedHashStr(Seq(a, b, c)) == Hashing.collatedHashStr(Seq(c, a, b)))
      assert(Hashing.taskHashStr(a, b) == Hashing.taskHashStr(b, a))
    }
  }

  test("collated hash distinguishes different member sets") {
    assert(Hashing.taskHashStr("s3://a/x", "s3://b/y") != Hashing.taskHashStr("s3://a/x", "s3://b/z"))
  }

  test("rowDigest xor-aggregate: row-order invariant, any single-row edit flips it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def digest(rows: Seq[(Long, String)]): Long = rows.toDF("id", "payload")
      .select(Hashing.rowDigest(col("id"), col("payload")).as("h"))
      .agg(expr("bit_xor(h)")).as[Long].head()
    val rows = samples(str, 30).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val base = digest(rows)
    assert(digest(scala.util.Random.shuffle(rows.toList)) == base,
      "digest must not depend on row order")
    assert(digest(rows.updated(7, (7L, rows(7)._2 + "!"))) != base,
      "editing a row must flip the digest")
    assert(digest(rows.drop(1)) != base, "removing a row must flip the digest")
    // values stay within the signed-long low-60-bit budget on every row
    val hs = rows.toDF("id", "payload")
      .select(Hashing.rowDigest(col("id"), col("payload")).as("h")).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("sum digest catches the even-multiplicity changes the xor digest cancels") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // duplicate rows cancel pairwise under xor: {X,X,Y} and {Z,Z,Y}
    // share n_docs AND bit_xor — the round-5 advice blind spot. The
    // manifest's second component (sum mod 2^60) must tell them apart.
    def digests(rows: Seq[(Long, String)]): (Long, Long) = rows.toDF("id", "payload")
      .select(Hashing.rowDigest(col("id"), col("payload")).as("h"))
      .agg(expr("bit_xor(h)"),
        (sum(col("h").cast("decimal(38,0)")) % lit(BigDecimal(1L << 60))).cast("long"))
      .as[(Long, Long)].head()
    val x = (1L, "alpha"); val y = (2L, "beta"); val z = (3L, "gamma")
    val (xorA, sumA) = digests(Seq(x, x, y))
    val (xorB, sumB) = digests(Seq(z, z, y))
    assert(xorA == xorB, "fixture must exercise the xor cancellation")
    assert(sumA != sumB, "the sum component failed to catch an even-multiplicity change")
    // and the sum is as order-invariant as the xor
    assert(digests(Seq(y, x, x))._2 == sumA)
  }

  test("canonical kv is insensitive to map insertion order (core/util.go:6-22)") {
    val kv = Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(10)), str)
    samples(Gen.mapOf(kv)).foreach { m =>
      // Map equality in Scala is order-free, so rebuild in reversed insertion order
      val reversed = m.toSeq.reverse.toMap
      assert(Hashing.canonicalKvStr(m) == Hashing.canonicalKvStr(reversed))
      assert(Hashing.strategyHashStr("docker", m) == Hashing.strategyHashStr("docker", reversed))
    }
  }

  test("Column expressions agree with the Scala mirrors") {
    import spark.implicits._
    val rows = Seq(
      ("s3://bucket/video/a.mov", "s3://mirror/chyme/bucket/video/a.mov/"),
      ("file:///tmp/x.mp4", "file:///tmp/out/"),
      ("s3://b/k", "s3://b/k")) // identical members: still deterministic
    val got = rows.toDF("in_url", "out_url")
      .select(
        Hashing.urlHash($"in_url").as("uh"),
        Hashing.taskHash($"in_url", $"out_url").as("th"),
        Hashing.strategyHash(lit("process"), map(lit("b"), lit("2"), lit("a"), lit("1"))).as("sh"))
      .collect()
    rows.zip(got).foreach { case ((in, out), r) =>
      assert(r.getString(0) == Hashing.urlHashStr(in))
      assert(r.getString(1) == Hashing.taskHashStr(in, out))
      assert(r.getString(2) == Hashing.strategyHashStr("process", Map("a" -> "1", "b" -> "2")))
    }
  }

  test("env split drops blanks; path→key relativizes (P7/P8)") {
    assert(Hashing.envStrToSeq("A=1\nB=2\n\n") == Seq("A=1", "B=2"))
    assert(Hashing.pathToKey("/work/in", "mirror/docs", "/work/in/src0/1.txt") == "mirror/docs/src0/1.txt")
  }
}
