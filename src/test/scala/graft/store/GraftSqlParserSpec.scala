package graft.store

import graft.SparkSpec
import org.apache.spark.sql.catalyst.parser.ParseException
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The injected parser ([[GraftSqlParser]]): extension verbs run as
  * plain `spark.sql` statements, the session parser always gets first
  * try, and genuinely invalid SQL still fails with the ORIGINAL parse
  * error. */
class GraftSqlParserSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_parser").toString
    s"$dir/t"
  }

  private def seed(t: String, n: Long = 100L): Unit =
    (1L to n).map(i => (i, s"doc$i")).toDF("id", "s")
      .write.format("graftlog").mode("append").option("mergeSchema", "true").save(t)

  test("OPTIMIZE / VACUUM DRY RUN / DESCRIBE HISTORY / DETAIL through plain spark.sql") {
    val t = freshTable()
    seed(t); seed(t) // two file generations → OPTIMIZE has work
    val opt = spark.sql(s"OPTIMIZE graftlog.`$t`").collect()
    assert(opt.length == 1 && opt(0).getString(0) == t && opt(0).getLong(1) == 3L)
    assert(CommitLog.liveFiles(spark, t)._2.size == 1)

    val vac = spark.sql(s"VACUUM graftlog.`$t` RETAIN 0 HOURS DRY RUN").collect()
    assert(vac(0).getString(0) == t && vac(0).getLong(1) >= 2L &&
      vac(0).getBoolean(2), s"dry run row: ${vac.toSeq}")
    // dry run touched nothing: the superseded files are still on disk
    assert(spark.sql(s"VACUUM graftlog.`$t` RETAIN 0 HOURS DRY RUN")
      .collect()(0).getLong(1) >= 2L)

    val hist = spark.sql(s"DESCRIBE HISTORY graftlog.`$t`").collect()
    assert(hist.map(_.getLong(0)).toSeq.sorted == Seq(1L, 2L, 3L))
    val det = spark.sql(s"DESCRIBE DETAIL graftlog.`$t`").collect()(0)
    assert(det.getString(0) == t && det.getLong(1) == 3L && det.getLong(2) == 1L)
  }

  test("RESTORE and SHALLOW CLONE through plain spark.sql") {
    val t = freshTable(); val c = freshTable()
    seed(t, 50L)
    (51L to 80L).map(i => (i, s"doc$i")).toDF("id", "s")
      .write.format("graftlog").mode("append").save(t)
    spark.sql(s"CREATE TABLE graftlog.`$c` SHALLOW CLONE graftlog.`$t` VERSION AS OF 1")
    assert(spark.read.format("graftlog").load(c).count() == 50L)
    val res = spark.sql(s"RESTORE graftlog.`$t` TO VERSION AS OF 1").collect()
    assert(res(0).getLong(1) == 3L)
    assert(spark.read.format("graftlog").load(t).count() == 50L)
  }

  test("ALTER TABLE ADD CONSTRAINT through spark.sql enforces on the write path") {
    val t = freshTable()
    seed(t, 10L)
    // Spark 4.1 parses ALTER ... ADD CONSTRAINT for v2 catalogs; the
    // path-addressed graftlog spelling is grammar-rejected there and
    // lands on the router — either way the constraint must enforce
    try spark.sql(s"ALTER TABLE graftlog.`$t` ADD CONSTRAINT pos CHECK (id > 0)")
    catch { case _: Exception =>
      GraftSql.execute(spark, s"ALTER TABLE graftlog.`$t` ADD CONSTRAINT pos CHECK (id > 0)")
    }
    assert(CommitLog.constraintsAt(spark, t) == Map("pos" -> "id > 0"))
    intercept[Exception] {
      Seq((-1L, "bad")).toDF("id", "s").write.format("graftlog").mode("append").save(t)
    }
  }

  test("parse is side-effect-free: EXPLAIN shows the command without executing it") {
    val t = freshTable()
    seed(t); seed(t)
    val before = CommitLog.latestVersion(spark, t)
    val filesBefore = CommitLog.liveFiles(spark, t)._2.size
    val plan = spark.sessionState.sqlParser.parsePlan(s"OPTIMIZE graftlog.`$t`")
    assert(plan.isInstanceOf[GraftSqlCommand], plan.getClass.getName)
    val explained = spark.sql(s"EXPLAIN OPTIMIZE graftlog.`$t`")
      .collect()(0).getString(0)
    assert(explained.contains("GraftSqlCommand"), explained)
    assert(CommitLog.latestVersion(spark, t) == before,
      "parse/EXPLAIN must not run the maintenance pass")
    assert(CommitLog.liveFiles(spark, t)._2.size == filesBefore,
      "parse/EXPLAIN must not compact anything")
  }

  test("invalid SQL keeps its original parse error; normal SQL is untouched") {
    val e = intercept[ParseException] {
      spark.sql("SELEKT 1")
    }
    assert(e.getMessage.toLowerCase.contains("syntax"), e.getMessage)
    // a verb-shaped statement against a non-graft catalog stays a
    // parse error too (the router does not recognize it)
    intercept[ParseException] {
      spark.sql("OPTIMIZE hive.sometable")
    }
    // a typo'd statement merely CONTAINING an explainable verb keeps
    // its original error — the EXPLAIN unwrap is a full-statement match
    intercept[ParseException] {
      spark.sql("SELECT x FROM EXPLAIN OPTIMIZE graftlog.`/tmp/never`")
    }
    assert(spark.sql("SELECT 1 AS x").collect()(0).getInt(0) == 1)
  }
}
