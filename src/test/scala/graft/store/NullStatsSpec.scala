package graft.store

import graft.SparkSpec
import graft.sources.StatsPruning
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, IsNotNull, IsNull}

/** Log-carried NULL COUNTS (`<col>.nulls` reserved stats keys): the
  * writer records per-file null counts at the only amortized moment
  * (the footer read it already pays), IS NULL / IS NOT NULL prune
  * files from the log alone, COUNT(col) folds to metadata, the keys
  * remap across column renames, and a real column whose NAME collides
  * with the reserved dotted key space always abstains. */
class NullStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = s"/tmp/graft_test/null_stats_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  private def isMetadataOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr }.isEmpty &&
      df.queryExecution.optimizedPlan.exists(_.isInstanceOf[LocalRelation])

  test("null counts ride the stats line, per column, summed over row groups") {
    val t = freshDir("emit")
    Seq((1L, "a"), (2L, null: String), (3L, null: String), (4L, "d"))
      .toDF("id", "s").repartition(1)
      .write.format("graftlog").mode("append").save(t)
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, t)
    val stats = CommitLog.parseStatsJson(withStats.head._2.get)
    assert(stats("id.nulls") == ((0L, 0L)))
    assert(stats("s.nulls") == ((2L, 2L)))
  }

  test("IS NULL / IS NOT NULL prune files from the log alone") {
    // three aligned files: all-null, no-null, mixed
    val allNull = Map[String, (Any, Any)](
      CommitLog.RowCountKey -> ((10L, 10L)), "v.nulls" -> ((10L, 10L)))
    val noNull = Map[String, (Any, Any)](
      CommitLog.RowCountKey -> ((10L, 10L)), "v.nulls" -> ((0L, 0L)))
    val mixed = Map[String, (Any, Any)](
      CommitLog.RowCountKey -> ((10L, 10L)), "v.nulls" -> ((3L, 3L)))
    val unrecorded = Map[String, (Any, Any)](
      CommitLog.RowCountKey -> ((10L, 10L)))
    // IS NULL: impossible only on the null-free file
    assert(StatsPruning.possible(allNull, IsNull("v")))
    assert(!StatsPruning.possible(noNull, IsNull("v")))
    assert(StatsPruning.possible(mixed, IsNull("v")))
    assert(StatsPruning.possible(unrecorded, IsNull("v")), "no counts → abstain")
    // `v <=> NULL` is the same question
    assert(!StatsPruning.possible(noNull, EqualNullSafe("v", null)))
    // IS NOT NULL: impossible only on the all-null file
    assert(!StatsPruning.possible(allNull, IsNotNull("v")))
    assert(StatsPruning.possible(noNull, IsNotNull("v")))
    assert(StatsPruning.possible(mixed, IsNotNull("v")))
    assert(StatsPruning.possible(unrecorded, IsNotNull("v")))
  }

  test("end-to-end: an IS NOT NULL scan skips the all-null file") {
    val t = freshDir("prune")
    Seq.fill(50)((null: java.lang.Long, "pad")).toDF("v", "p").repartition(1)
      .write.format("graftlog").mode("append").save(t)
    Seq((1L: java.lang.Long, "a"), (2L: java.lang.Long, "b")).toDF("v", "p")
      .repartition(1).write.format("graftlog").mode("append").save(t)
    val df = spark.read.format("graftlog").load(t).where(col("v").isNotNull)
    assert(df.count() == 2L)
    // the pruned scan reads ONE file: prove it through the file index
    val scanned = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.sum
    assert(scanned == 1L, s"expected the all-null file pruned, scanned $scanned")
  }

  test("COUNT(col) folds across generations and survives a rename") {
    val t = freshDir("rename")
    spark.sql(
      s"CREATE TABLE graft.`$t` (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 'a'), (2, NULL), (3, 'c')")
    spark.sql(s"INSERT INTO graft.`$t` VALUES (4, NULL), (5, 'e')")
    CommitLog.renameColumn(spark, t, "v", "w")
    val agg = spark.read.format("graftlog").load(t).agg(count(col("w")).as("n"))
    assert(isMetadataOnly(agg),
      s"renamed COUNT(col) must still fold:\n${agg.queryExecution.optimizedPlan}")
    assert(agg.collect()(0).getLong(0) == 3L)
    spark.sql(s"DROP TABLE graft.`$t`")
  }

  test("a column named like a reserved key abstains everywhere, never mis-prunes") {
    // synthetic stats as the emitter would write them for a table with
    // a clean column `x` — plus the engine's reserved keys. A USER
    // column literally named `x.nulls` (legal via backticks) must not
    // resolve to them.
    val stats = Map[String, (Any, Any)](
      CommitLog.RowCountKey -> ((10L, 10L)),
      "x" -> ((1L, 5L)), "x.nulls" -> ((0L, 0L)))
    assert(StatsPruning.possible(stats, EqualTo("x.nulls", 7L)),
      "a dotted attribute must abstain from bounds pruning")
    assert(StatsPruning.possible(stats, IsNull("x.nulls")),
      "a dotted attribute must abstain from null pruning")
    assert(StatsPruning.possible(stats, EqualTo("rows.count", 3L)),
      "a column named rows.count must abstain, not prune on file row counts")
    // the real column still prunes
    assert(!StatsPruning.possible(stats, EqualTo("x", 7L)))
    assert(!StatsPruning.possible(stats, IsNull("x")))
  }
}
