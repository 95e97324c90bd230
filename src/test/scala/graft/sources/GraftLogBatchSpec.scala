package graft.sources

import graft.SparkSpec
import graft.store.CommitLog
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The logged table as a standard Spark BATCH relation
  * (`spark.read.format("graftlog")` / `df.write.format("graftlog")`):
  * write-mode semantics, time travel options, and — the scale claim —
  * driver-side file skipping from log-carried stats, proven by
  * DESTROYING the bytes of every file the predicate rules out and
  * watching the query still answer (the file was never opened). */
class GraftLogBatchSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_batch").toString + "/t"

  private def fsOf(t: String) = new org.apache.hadoop.fs.Path(t)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Overwrite every live data file except `keep` with garbage bytes:
    * any subsequent open of those files fails loudly, so a query that
    * succeeds provably pruned them without I/O. */
  private def destroyAllBut(t: String, keep: String => Boolean): Int = {
    val fs = fsOf(t)
    val (_, files) = CommitLog.liveFiles(spark, t)
    val doomed = files.filterNot(keep)
    doomed.foreach { n =>
      val out = fs.create(new org.apache.hadoop.fs.Path(t, n), true)
      out.write("not a parquet file".getBytes("UTF-8"))
      out.close()
    }
    doomed.size
  }

  test("write modes: append, overwrite, errorifexists, ignore") {
    val t = freshTable()
    spark.range(0, 50).toDF("id")
      .write.format("graftlog").mode("append").save(t)
    spark.range(50, 80).toDF("id")
      .write.format("graftlog").mode("append").save(t)
    val rel = spark.read.format("graftlog").load(t)
    assert(rel.count() == 80)
    assert(rel.agg(sum("id")).as[Long].head() == (0L until 80).sum)

    // errorifexists refuses a live table; ignore no-ops
    intercept[IllegalStateException] {
      spark.range(5).toDF("id")
        .write.format("graftlog").mode("errorifexists").save(t)
    }
    spark.range(5).toDF("id")
      .write.format("graftlog").mode("ignore").save(t)
    assert(spark.read.format("graftlog").load(t).count() == 80)

    // overwrite replaces atomically; history still reaches the past
    spark.range(1000, 1010).toDF("id")
      .write.format("graftlog").mode("overwrite").save(t)
    assert(spark.read.format("graftlog").load(t)
      .agg(sum("id")).as[Long].head() == (1000L until 1010).sum)
    assert(spark.read.format("graftlog").option("versionAsOf", 2)
      .load(t).count() == 80)
    assert(spark.read.format("graftlog").option("versionAsOf", 1)
      .load(t).count() == 50)
  }

  test("overwrite stops a change-feed consumer loudly, never silently") {
    val t = freshTable()
    spark.range(0, 20).toDF("id")
      .write.format("graftlog").mode("append").save(t)
    spark.range(100, 120).toDF("id")
      .write.format("graftlog").mode("overwrite").save(t)
    intercept[graft.store.FeedGapException] {
      CommitLog.changesSince(spark, t, 0L,
        spark.range(0).toDF("id").schema).count()
    }
  }

  test("timestampAsOf resolves through in-commit timestamps") {
    val t = freshTable()
    spark.range(0, 10).toDF("id")
      .write.format("graftlog").mode("append").save(t)
    val ts1 = CommitLog.history(spark, t)
      .filter(col("version") === 1 && col("operation") =!= "checkpoint")
      .select("commit_ts_ms").as[Long].head()
    spark.range(10, 30).toDF("id")
      .write.format("graftlog").mode("append").save(t)
    assert(spark.read.format("graftlog")
      .option("timestampAsOf", ts1.toString).load(t).count() == 10)
    assert(spark.read.format("graftlog")
      .option("timestampAsOf",
        java.time.Instant.ofEpochMilli(ts1).toString).load(t).count() == 10)
  }

  test("numeric predicate skips files from LOG stats alone — zero file I/O") {
    val t = freshTable()
    // three disjoint id-range files (one part file per append)
    Seq(0L -> 100L, 1000L -> 1100L, 5000L -> 5100L).foreach { case (a, b) =>
      spark.range(a, b).toDF("id").coalesce(1)
        .write.format("graftlog").mode("append").save(t)
    }
    // every add line carries stats
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, t)
    assert(withStats.size == 3 && withStats.forall(_._2.isDefined))
    // destroy the two files a point-range predicate rules out
    val keep = withStats.collect {
      case (n, Some(js)) if CommitLog.parseStatsJson(js)("id")._1 == 0L => n
    }.toSet
    assert(destroyAllBut(t, keep) == 2)
    // schema passed explicitly: default inference opens the newest
    // live file once, which this test just destroyed on purpose
    val sch = spark.range(0).toDF("id").schema
    val pruned = spark.read.format("graftlog").schema(sch).load(t)
      .where(col("id") < 50)
    assert(pruned.count() == 50)
    assert(pruned.agg(sum("id")).as[Long].head() == (0L until 50).sum)
    // IN-list and boundary operators prune too
    assert(spark.read.format("graftlog").schema(sch).load(t)
      .where(col("id").isin(3L, 7L)).count() == 2)
    assert(spark.read.format("graftlog").schema(sch).load(t)
      .where(col("id") <= 99L).count() == 100)
    // and a predicate needing a destroyed file fails loudly (the same
    // plan shape — proves the successes above came from pruning)
    intercept[Throwable] {
      spark.read.format("graftlog").schema(sch).load(t)
        .where(col("id") > 4000).count()
    }
  }

  test("string predicate skips files from LOG stats (truncate-safe bounds)") {
    val t = freshTable()
    val longTail = "x" * 100 // force truncate-and-successor encoding
    Seq("a", "m", "z").foreach { p =>
      spark.range(0, 40).select(
          concat(lit(p), lit("doc"), format_string("%03d", col("id")),
            lit(longTail)).as("doc"),
          col("id"))
        .coalesce(1).write.format("graftlog").mode("append").save(t)
    }
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, t)
    assert(withStats.forall(_._2.isDefined))
    // the truncated bounds still envelope their file
    withStats.foreach { case (_, Some(js)) =>
      val (lo, hi) = CommitLog.parseStatsJson(js)("doc")
      assert(CommitLog.utf8UnsignedCmp(lo.asInstanceOf[String],
        hi.asInstanceOf[String]) <= 0)
    case _ => fail("stats missing")
    }
    val keep = withStats.collect {
      case (n, Some(js))
          if CommitLog.parseStatsJson(js)("doc")._1.asInstanceOf[String]
            .startsWith("a") => n
    }.toSet
    assert(keep.size == 1 && destroyAllBut(t, keep) == 2)
    val sch = spark.range(0).select(lit("").as("doc"), col("id")).schema
    // equality, range, and prefix predicates all decide from the log
    val q1 = spark.read.format("graftlog").schema(sch).load(t)
      .where(col("doc") === s"adoc007$longTail")
    assert(q1.count() == 1)
    assert(spark.read.format("graftlog").schema(sch).load(t)
      .where(col("doc") < "b").count() == 40)
    assert(spark.read.format("graftlog").schema(sch).load(t)
      .where(col("doc").startsWith("adoc")).count() == 40)
    intercept[Throwable] {
      spark.read.format("graftlog").schema(sch).load(t)
        .where(col("doc") > "y").count()
    }
  }

  test("timestamp_ntz predicate skips files from LOG stats (micros domain)") {
    val t = freshTable()
    Seq(0, 1000, 5000).foreach { off =>
      spark.range(0, 60).select(
          expr(s"timestamp_ntz'2024-03-01 00:00:00' + make_dt_interval(0, 0, 0, id + $off)")
            .as("ts"), col("id"))
        .coalesce(1).write.format("graftlog").mode("append").save(t)
    }
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, t)
    assert(withStats.forall(_._2.exists(_.contains("\"ts\""))),
      s"ts stats missing: $withStats")
    // keep only the offset-0 file (seconds 0..59 past midnight): its
    // stats max, in MICROS, is below the one-minute mark
    val minuteOneMicros = java.time.LocalDateTime.of(2024, 3, 1, 0, 1, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val first = withStats.collect {
      case (n, Some(js)) if CommitLog.parseStatsJson(js)("ts")._2
        .asInstanceOf[Long] < minuteOneMicros => n
    }.toSet
    assert(first.size == 1, s"expected one early file among $withStats")
    assert(destroyAllBut(t, first) == 2)
    val sch = spark.range(0)
      .select(expr("timestamp_ntz'2024-03-01 00:00:00'").as("ts"), col("id"))
      .schema
    val q = spark.read.format("graftlog").schema(sch).load(t)
      .where(col("ts") < lit(java.time.LocalDateTime.of(2024, 3, 1, 0, 1, 0)))
    assert(q.count() == 60)
  }

  test("files without stats and incomparable predicates are always kept") {
    val t = freshTable()
    spark.range(0, 30).toDF("id").coalesce(1)
      .write.format("graftlog").mode("append").save(t)
    // strip the stats suffix from the commit line: a pre-stats
    // generation file must survive every predicate
    val fs = fsOf(t)
    val logDir = new org.apache.hadoop.fs.Path(t, "_graft_log")
    val commit = fs.listStatus(logDir)
      .map(_.getPath).filter(_.getName.endsWith(".commit")).head
    val lines = scala.io.Source.fromInputStream(fs.open(commit)).getLines().toSeq
    val stripped = lines.map(l =>
      if (l.startsWith("+")) l.takeWhile(_ != '|') else l)
    val out = fs.create(commit, true)
    out.write(stripped.mkString("\n").getBytes("UTF-8")); out.close()
    assert(spark.read.format("graftlog").load(t)
      .where(col("id") === 7L).count() == 1)
    assert(spark.read.format("graftlog").load(t)
      .where(col("id") > 1000L).count() == 0)
  }

  test("schema ledger drives the batch relation's schema across evolution") {
    val t = freshTable()
    spark.range(0, 10).toDF("id")
      .write.format("graftlog").mode("append").save(t)
    spark.range(10, 20).toDF("id").withColumn("score", col("id") * 2.0)
      .write.format("graftlog").mode("append").option("mergeSchema", "true")
      .save(t)
    val rel = spark.read.format("graftlog").load(t)
    assert(rel.columns.toSeq == Seq("id", "score"))
    assert(rel.where(col("score").isNull).count() == 10)
    // the pre-evolution snapshot still reads with its own shape
    assert(spark.read.format("graftlog").option("versionAsOf", 1).load(t)
      .columns.toSeq == Seq("id"))
  }

  test("clustered compaction turns point queries into single-file reads") {
    val t = freshTable()
    // one shuffled append: every file's id range overlaps everything,
    // so nothing could prune
    spark.range(0, 4000)
      .select((col("id") * 2654435761L % 4000).as("id")).repartition(4)
      .write.format("graftlog").mode("append").save(t)
    // range-cluster through the LOGGED compactor: the rewrite commits
    // files with disjoint id ranges AND their stats in one version
    val fs = fsOf(t)
    val total = CommitLog.liveFiles(spark, t)._2.map(n =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(t, n)).getLen).sum
    CommitLog.compact(spark, t, targetBytes = total / 4, clusterBy = Some("id"))
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, t)
    assert(withStats.size >= 3 && withStats.forall(_._2.isDefined))
    val keep = withStats.collect {
      case (n, Some(js)) =>
        val (lo, hi) = CommitLog.parseStatsJson(js)("id")
        (n, lo.asInstanceOf[Long], hi.asInstanceOf[Long])
    }.collect { case (n, lo, hi) if lo <= 5L && 5L <= hi => n }.toSet
    assert(keep.size == 1, s"clustering left overlapping id ranges: $withStats")
    assert(destroyAllBut(t, keep) == withStats.size - 1)
    val sch = spark.range(0).toDF("id").schema
    assert(spark.read.format("graftlog").schema(sch).load(t)
      .where(col("id") === 5L).count() == 1)
  }

  test("sizeInBytes reflects the live snapshot (broadcast sizing)") {
    val t = freshTable()
    spark.range(0, 1000).toDF("id")
      .write.format("graftlog").mode("append").save(t)
    val idx = new GraftLogFileIndex(spark, t)
    val fs = fsOf(t)
    val expected = CommitLog.liveFiles(spark, t)._2.map(n =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(t, n)).getLen).sum
    assert(idx.sizeInBytes == expected && expected > 0)
  }
}
