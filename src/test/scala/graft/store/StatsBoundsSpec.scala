package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files

/** The log-carried stats ENCODING's safety properties: string bounds
  * stay a valid envelope under truncate-and-successor (property-
  * checked across the full code-point space, supplementary planes
  * included), the one-line JSON round-trips escaped strings without
  * ever framing a fake entry, and the compare layer refuses the two
  * lies it could otherwise be told — scale-blind decimal compares and
  * mixed-type evidence. */
class StatsBoundsSpec extends SparkSpec {

  // scalatestplus-scalacheck isn't in the offline cache: sample Gen
  // directly with fixed seeds (reproducible), the KernelPropertySpec
  // pattern
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val anyString: Gen[String] = for {
    n <- Gen.choose(0, 3 * CommitLog.StatsStringCap)
    cps <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.choose(32, 126),          // ASCII
      2 -> Gen.choose(0x80, 0xD7FF),     // BMP
      1 -> Gen.oneOf('"'.toInt, '\\'.toInt, '\n'.toInt, 0x09),
      2 -> Gen.choose(0x10000, 0x10FFFF) // supplementary planes
    ))
  } yield new String(cps.toArray, 0, cps.size)

  test("string bounds envelope the value in unsigned UTF-8 order") {
    val maxCp = new String(Array(0x10FFFF), 0, 1)
    samples(anyString, 500).foreach { s =>
      val lo = CommitLog.statsLowerBound(s)
      assert(CommitLog.utf8UnsignedCmp(lo, s) <= 0, s"lo !<= [$s]")
      assert(lo.length <= CommitLog.StatsStringCap)
      CommitLog.statsUpperBound(s).foreach { hi =>
        assert(CommitLog.utf8UnsignedCmp(hi, s) >= 0, s"hi !>= [$s]")
        // a TRUNCATED bound is a successor: it must stay above every
        // continuation sharing the cut prefix, not just s itself
        if (s.length > CommitLog.StatsStringCap)
          assert(CommitLog.utf8UnsignedCmp(hi, s + maxCp) >= 0,
            s"hi not a prefix successor of [$s]")
      }
    }
  }

  test("all-maximal prefix has no finite successor; surrogate gap is skipped") {
    val maximal = new String(Array.fill(CommitLog.StatsStringCap + 1)(0x10FFFF), 0,
      CommitLog.StatsStringCap + 1)
    assert(CommitLog.statsUpperBound(maximal).isEmpty)
    val edge = "a" * (CommitLog.StatsStringCap - 1) + "\ud7ff" + "zzz"
    assert(CommitLog.statsUpperBound(edge).contains(
      "a" * (CommitLog.StatsStringCap - 1) + "\ue000"))
  }

  test("stats JSON round-trips escaped strings; fake entries cannot frame") {
    val t = Files.createTempDirectory("graft_statjson").toString + "/t"
    // values that try to break the one-line JSON: quotes, backslashes,
    // newlines, an embedded fake stats entry under a REAL column name
    val hostile = Seq(
      """he said "hi"""", """back\slash""", "line\nbreak",
      """injected","id":[999,999],"z":"x""")
    import spark.implicits._
    CommitLog.append(
      hostile.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "doc").coalesce(1), t)
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, t)
    val stats = CommitLog.parseStatsJson(withStats.head._2.get)
    // the id envelope is the REAL one — no injected [999,999] framing
    assert(stats("id") == ((0L, 3L)))
    val (lo, hi) = stats("doc")
    hostile.foreach { s =>
      assert(CommitLog.utf8UnsignedCmp(lo.asInstanceOf[String], s) <= 0)
      assert(CommitLog.utf8UnsignedCmp(hi.asInstanceOf[String], s) >= 0)
    }
    assert(!stats.contains("z"))
  }

  test("decimal merge keys never prune from unscaled stats (numCmp guard)") {
    // a legacy log entry carrying decimal stats as raw UNSCALED ints:
    // 1.00 stored as 100 — a scale-blind compare would call [1.00,
    // 2.00] disjoint from [100, 200] and wrongly skip the file
    assert(CommitLog.numCmp(new java.math.BigDecimal("1.00"), 100L).isEmpty)
    assert(CommitLog.numCmp(100L, new java.math.BigDecimal("1.00")).isEmpty)
    // and live: a decimal-keyed merge updates instead of duplicating
    val t = Files.createTempDirectory("graft_decmerge").toString + "/t"
    import spark.implicits._
    val base = spark.range(0, 20)
      .select(col("id").cast("decimal(10,2)").as("k"),
        concat(lit("v"), col("id")).as("text"))
    CommitLog.append(base.coalesce(1), t)
    val src = spark.range(5, 10)
      .select(col("id").cast("decimal(10,2)").as("k"), lit("upd").as("text"))
    CommitLog.merge(spark, t, base.schema, src, Seq("k"))
    val out = CommitLog.read(spark, t, base.schema)
    assert(out.count() == 20)
    assert(out.where(col("text") === "upd").count() == 5)
  }

  test("decimal and non-micros timestamp columns abstain from the stats line") {
    val t = Files.createTempDirectory("graft_abstain").toString + "/t"
    import spark.implicits._
    val df = spark.range(0, 10)
      .select(col("id"), col("id").cast("decimal(10,2)").as("d"))
    CommitLog.append(df.coalesce(1), t)
    val stats = CommitLog.parseStatsJson(
      CommitLog.liveFilesWithStats(spark, t)._2.head._2.get)
    assert(stats.contains("id") && !stats.contains("d"))
  }
}
