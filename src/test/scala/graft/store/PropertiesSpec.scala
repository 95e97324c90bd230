package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Table properties (`TBLPROPERTIES`): the `bloom.columns` property
  * must drive write-time bloom filters through EVERY path that lands
  * data files — plain appends, SQL OPTIMIZE, and copy-on-write
  * rewrites a caller never hands writer options to. Before this
  * ledger, any maintenance pass without explicit writeOptions
  * silently dropped the point-lookup index. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_props").toString + "/t"

  private val schema = spark.range(0).toDF("id").schema

  /** Live data files of `t` that carry a bloom filter on `colName`. */
  private def bloomed(t: String, colName: String): Set[String] = {
    val live = CommitLog.liveFiles(spark, t)._2.toSet
    Bloom.bloomColumns(spark, t)
      .collect { case (f, c) if c == colName && live(f) => f }.toSet
  }

  test("bloom.columns rides every write path without explicit options") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 100).toDF("id"), t)
    // pre-property files carry no filters
    assert(bloomed(t, "id").isEmpty)
    CommitLog.setProperties(spark, t, Map(
      "bloom.columns" -> "id", "bloom.ndv" -> "1000"))
    // plain append: filters appear with zero caller options
    CommitLog.append(spark.range(100, 200).toDF("id"), t)
    assert(bloomed(t, "id").nonEmpty, "append dropped the declared bloom index")
    // SQL OPTIMIZE FULL rewrites everything — every live file must
    // carry the filter afterwards, still with zero caller options
    GraftSql.execute(spark, s"OPTIMIZE graftlog.`$t` FULL")
    val live = CommitLog.liveFiles(spark, t)._2.toSet
    assert(bloomed(t, "id") == live,
      s"OPTIMIZE dropped the bloom index: ${bloomed(t, "id").size}/${live.size}")
    // copy-on-write delete: the rewritten file keeps the filter
    CommitLog.deleteWhere(spark, t, schema, col("id") === 7)
    val live2 = CommitLog.liveFiles(spark, t)._2.toSet
    assert(bloomed(t, "id") == live2, "COW rewrite dropped the bloom index")
    assert(CommitLog.read(spark, t, schema).count() == 199)
  }

  test("merge rewrites keep the declared index; explicit options still win") {
    val t = freshTable()
    CommitLog.setProperties(spark, t, Map("bloom.columns" -> "id"))
    CommitLog.append(spark.range(0, 50).toDF("id"), t)
    CommitLog.merge(spark, t, schema, Seq(7L, 999L).toDF("id"), Seq("id"))
    val live = CommitLog.liveFiles(spark, t)._2.toSet
    assert(bloomed(t, "id") == live, "merge rewrite dropped the bloom index")
    // per-column ndv override parses (shape check only)
    assert(CommitLog.bloomOptions(Map(
      "bloom.columns" -> "a,b", "bloom.ndv" -> "10", "bloom.ndv.b" -> "99")) ==
      Map("parquet.bloom.filter.enabled#a" -> "true",
        "parquet.bloom.filter.expected.ndv#a" -> "10",
        "parquet.bloom.filter.enabled#b" -> "true",
        "parquet.bloom.filter.expected.ndv#b" -> "99"))
  }

  test("property ledger: SQL set/unset, prune survival, loud unset-missing") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 5).toDF("id"), t)
    GraftSql.execute(spark,
      s"ALTER TABLE graftlog.`$t` SET TBLPROPERTIES ('bloom.columns'='id', 'owner'='corpus-team')")
    assert(CommitLog.propertiesAt(spark, t) ==
      Map("bloom.columns" -> "id", "owner" -> "corpus-team"))
    // survive a checkpoint + prune
    (0 until 12).foreach(i => CommitLog.append(Seq(100L + i).toDF("id"), t))
    CommitLog.pruneLog(spark, t)
    assert(CommitLog.propertiesAt(spark, t)("owner") == "corpus-team",
      "property lost to log pruning — the checkpoint must carry it")
    GraftSql.execute(spark,
      s"ALTER TABLE graftlog.`$t` UNSET TBLPROPERTIES ('owner')")
    assert(CommitLog.propertiesAt(spark, t) == Map("bloom.columns" -> "id"))
    intercept[IllegalArgumentException] {
      CommitLog.unsetProperties(spark, t, Seq("nonexistent"))
    }
    // historical view
    assert(CommitLog.propertiesAt(spark, t, asOf = 1).isEmpty)
  }
}
