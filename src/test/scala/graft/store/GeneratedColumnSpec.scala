package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generated columns behind `graft.generated.<col>` table properties
  * ([[CommitLog.withGenerated]]): omitted columns are computed into
  * the write (and into the schema ledger on a creating append),
  * explicit values are checked against the expression on every
  * row-writing path, and the derived key composes with writer-side
  * clustering. */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = s"/tmp/graft_test/gen_col_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  test("an omitted generated column is computed and recorded in the schema ledger") {
    val t = freshDir("fill")
    CommitLog.setProperties(spark, t,
      Map("graft.generated.day" -> "CAST(ts / 86400 AS BIGINT)"))
    CommitLog.append(Seq((1L, 100000L), (2L, 200000L)).toDF("id", "ts"), t,
      mergeSchema = true)
    val sch = CommitLog.schemaAt(spark, t).get
    assert(sch.fieldNames.contains("day"),
      s"creating append must record the generated column: $sch")
    val rows = spark.read.format("graftlog").load(t)
      .select("id", "day").as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 1L), (2L, 2L)))
  }

  test("an explicit value must match the expression; a divergent row fails loudly") {
    val t = freshDir("enforce")
    CommitLog.setProperties(spark, t,
      Map("graft.generated.day" -> "CAST(ts / 86400 AS BIGINT)"))
    // matching explicit values pass
    Seq((1L, 100000L, 1L)).toDF("id", "ts", "day")
      .write.format("graftlog").mode("append").save(t)
    // a divergent one fails before publishing
    val before = CommitLog.latestVersion(spark, t)
    val ex = intercept[Exception] {
      Seq((2L, 200000L, 99L)).toDF("id", "ts", "day")
        .write.format("graftlog").mode("append").save(t)
    }
    assert(ex.getMessage.contains("day") ||
      Option(ex.getCause).exists(_.getMessage.contains("day")),
      s"error must name the column: ${ex.getMessage}")
    assert(CommitLog.latestVersion(spark, t) == before,
      "a refused generated-column write must not commit")
    assert(spark.read.format("graftlog").load(t).count() == 1)
  }

  test("UPDATE that breaks the invariant fails; a consistent restatement succeeds") {
    val t = freshDir("update")
    CommitLog.setProperties(spark, t,
      Map("graft.generated.day" -> "CAST(ts / 86400 AS BIGINT)"))
    Seq((1L, 100000L)).toDF("id", "ts")
      .write.format("graftlog").mode("append").save(t)
    val sch = CommitLog.tableSchema(spark, t)
    // changing ts without restating day: the post-image violates
    intercept[Exception] {
      CommitLog.updateWhere(spark, t, sch, col("id") === 1L,
        Map("ts" -> lit(900000L)))
    }
    // restating both consistently lands
    CommitLog.updateWhere(spark, t, sch, col("id") === 1L,
      Map("ts" -> lit(900000L), "day" -> lit(10L)))
    val r = spark.read.format("graftlog").load(t)
      .select("ts", "day").as[(Long, Long)].head()
    assert(r == ((900000L, 10L)))
  }

  test("a case-variant explicit column takes the VALIDATION branch, never silent overwrite") {
    val t = freshDir("case")
    CommitLog.setProperties(spark, t,
      Map("graft.generated.day" -> "CAST(ts / 86400 AS BIGINT)"))
    // under the default case-insensitive resolver, DAY *is* the
    // generated column: a divergent value must fail loudly — the
    // contains()-based membership would have silently overwritten it
    val ex = intercept[Exception] {
      Seq((1L, 100000L, 99L)).toDF("id", "ts", "DAY")
        .write.format("graftlog").mode("append").save(t)
    }
    assert(ex.getMessage.contains("day") ||
      Option(ex.getCause).exists(_.getMessage.contains("day")),
      s"case-variant explicit column bypassed validation: ${ex.getMessage}")
    // and a CONSISTENT case-variant value lands
    Seq((2L, 100000L, 1L)).toDF("id", "ts", "DAY")
      .write.format("graftlog").mode("append").save(t)
    assert(spark.read.format("graftlog").load(t).count() == 1)
  }

  test("an unparseable or name-less generated property fails at SET, not at the next write") {
    val t = freshDir("setguard")
    // every write AND every rename/drop guard parses the expression —
    // accepted malformed, it bricks all of them
    val ex = intercept[IllegalArgumentException] {
      CommitLog.setProperties(spark, t, Map("graft.generated.day" -> "CAST(("))
    }
    assert(ex.getMessage.contains("parseable"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      CommitLog.setProperties(spark, t, Map("graft.generated." -> "id + 1"))
    }
    assert(ex2.getMessage.contains("generated"), ex2.getMessage)
    assert(CommitLog.latestVersion(spark, t) == 0,
      "a refused generated property must not commit")
  }

  test("rename/drop refused for a generated column and for its expression inputs") {
    val t = freshDir("guard")
    CommitLog.setProperties(spark, t,
      Map("graft.generated.day" -> "CAST(ts / 86400 AS BIGINT)"))
    Seq((1L, 100000L)).toDF("id", "ts")
      .write.format("graftlog").mode("append").save(t)
    // dropping/renaming the expression INPUT would leave the generation
    // unresolvable — every subsequent write fails
    for (op <- Seq(
        () => CommitLog.dropColumn(spark, t, "ts"),
        () => CommitLog.renameColumn(spark, t, "ts", "when"),
        // the generated column itself: property would dangle
        () => CommitLog.dropColumn(spark, t, "day"),
        () => CommitLog.renameColumn(spark, t, "day", "d"))) {
      val ex = intercept[IllegalArgumentException](op())
      assert(ex.getMessage.contains("generated"), ex.getMessage)
    }
    // untouched columns still rename
    CommitLog.renameColumn(spark, t, "id", "doc_id")
    assert(CommitLog.tableSchema(spark, t).fieldNames.contains("doc_id"))
  }

  test("generated day + CLUSTER BY day: a day predicate prunes to the day's files") {
    // the end-to-end value claim of the pair: the caller writes only
    // (id, ts); the WRITER derives day and lays the batch out by it, so
    // a later day-scoped query prunes by log stats without the caller
    // ever materializing the partition key itself
    val t = freshDir("prune")
    CommitLog.setProperties(spark, t, Map(
      "graft.generated.day" -> "CAST(ts / 86400 AS BIGINT)",
      "graft.clusterBy" -> "day",
      "graft.clusterBy.files" -> "4"))
    (0L until 100L).map(i => (i, (i / 25L) * 86400L + i)).toDF("id", "ts")
      .write.format("graftlog").mode("append").save(t)
    val files = CommitLog.liveFiles(spark, t)._2
    assert(files.size == 4, s"expected 4 clustered files: $files")
    val df = spark.read.format("graftlog").load(t).where(col("day") === 2L)
    assert(df.count() == 25L)
    assert(df.agg(min("id"), max("id")).as[(Long, Long)].head() == ((50L, 74L)))
    val scanned = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.sum
    assert(scanned == 1L,
      s"day predicate must prune to the day's single clustered file, scanned $scanned of ${files.size}")
  }

  test("streaming appendOnce generates too; the key composes with clusterBy") {
    val t = freshDir("stream")
    CommitLog.setProperties(spark, t, Map(
      "graft.generated.bucket" -> "CAST(id % 4 AS BIGINT)",
      "graft.clusterBy" -> "bucket", "graft.clusterBy.files" -> "4"))
    CommitLog.appendOnce(spark.range(0, 100).toDF("id"), t, "genq", 0L)
    val got = spark.read.format("graftlog").load(t)
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L))
    // the generated key drove the layout: per-file bucket ranges narrow
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, t)
    val ranges = withStats.map { case (n, js) =>
      val b = CommitLog.parseStatsJson(js.getOrElse(fail(s"no stats: $n")))("bucket")
      (b._1.asInstanceOf[Long], b._2.asInstanceOf[Long])
    }
    assert(ranges.exists { case (lo, hi) => lo == hi },
      s"expected at least one single-bucket file: $ranges")
  }
}
