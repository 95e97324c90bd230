package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Write-triggered auto-compaction behind the `graft.autoCompact`
  * table property ([[CommitLog.maybeAutoCompact]]): the census folds
  * log-carried per-file sizes (metadata-only trigger), compaction runs
  * as a follow-on commit after append-shaped writes, converges (no
  * churn re-trigger), and stays off by default. */
class AutoCompactSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"/tmp/graft_test/auto_compact_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  private def liveCount(t: String): Int = CommitLog.liveFiles(spark, t)._2.size

  private def rows(t: String): Set[Long] =
    spark.read.format("graftlog").load(t)
      .select("id").collect().map(_.getLong(0)).toSet

  // each append is one small file (repartition(1) over a few rows)
  private def slice(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo to hi).map(i => (i, s"doc$i")).toDF("id", "s").repartition(1)
  }

  test("off by default: small appends accumulate files") {
    val t = freshDir("off")
    (0 until 6).foreach(i => CommitLog.append(
      slice(i * 10L + 1, i * 10L + 10), t, mergeSchema = i == 0))
    assert(liveCount(t) == 6)
  }

  test("property-driven: the trigger compacts small files after the Nth append") {
    val t = freshDir("on")
    CommitLog.append(slice(1, 10), t, mergeSchema = true)
    CommitLog.setProperties(spark, t, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.smallFileBytes" -> (1L << 20).toString,
      "graft.autoCompact.minFiles" -> "4",
      "graft.autoCompact.targetBytes" -> (1L << 30).toString))
    CommitLog.append(slice(11, 20), t)
    CommitLog.append(slice(21, 30), t)
    assert(liveCount(t) == 3, "below minFiles: no compaction yet")
    CommitLog.append(slice(31, 40), t) // 4th small file → trigger
    assert(liveCount(t) == 1, "4 small files should compact to one")
    assert(rows(t) == (1L to 40L).toSet)
    // the compaction is a separate follow-on commit; time travel still
    // reaches the pre-compaction state
    val v = CommitLog.latestVersion(spark, t)
    assert(CommitLog.read(spark, t, CommitLog.tableSchema(spark, t), asOf = v - 1)
      .count() == 40L)
  }

  test("converges: one small file after compaction does not re-trigger") {
    val t = freshDir("converge")
    CommitLog.append(slice(1, 10), t, mergeSchema = true)
    CommitLog.setProperties(spark, t, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.smallFileBytes" -> (1L << 20).toString,
      "graft.autoCompact.minFiles" -> "3",
      "graft.autoCompact.targetBytes" -> (1L << 30).toString))
    CommitLog.append(slice(11, 20), t)
    CommitLog.append(slice(21, 30), t) // 3rd → compacts to 1
    assert(liveCount(t) == 1)
    val vAfter = CommitLog.latestVersion(spark, t)
    CommitLog.append(slice(31, 40), t) // 2 small files < minFiles
    assert(CommitLog.latestVersion(spark, t) == vAfter + 1,
      "a below-threshold append must be exactly one commit (no compaction)")
    assert(liveCount(t) == 2)
    assert(rows(t) == (1L to 40L).toSet)
  }

  test("streaming exactly-once appends trigger it too") {
    val t = freshDir("stream")
    CommitLog.append(slice(1, 10), t, mergeSchema = true)
    CommitLog.setProperties(spark, t, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.smallFileBytes" -> (1L << 20).toString,
      "graft.autoCompact.minFiles" -> "4",
      "graft.autoCompact.targetBytes" -> (1L << 30).toString))
    CommitLog.appendOnce(slice(11, 20), t, "q1", 1L)
    CommitLog.appendOnce(slice(21, 30), t, "q1", 2L)
    assert(liveCount(t) == 3)
    CommitLog.appendOnce(slice(31, 40), t, "q1", 3L) // 4th → compact
    assert(liveCount(t) == 1)
    assert(rows(t) == (1L to 40L).toSet)
    // the exactly-once ledger survives the compaction commit
    assert(CommitLog.lastTxnBatch(spark, t, "q1") == 3L)
    // a replayed batch still skips (and must not re-trigger anything)
    val v = CommitLog.latestVersion(spark, t)
    assert(CommitLog.appendOnce(slice(31, 40), t, "q1", 3L).isEmpty)
    assert(CommitLog.latestVersion(spark, t) == v)
  }

  test("a malformed knob logs instead of failing the already-committed append") {
    val t = freshDir("badknob")
    CommitLog.append(slice(1, 10), t, mergeSchema = true)
    // '128MB' is not a number — validateProperty only checks shape, so
    // the value lands; the append must still succeed (its data commit
    // published before the auto-compact hook ran)
    CommitLog.setProperties(spark, t, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.targetBytes" -> "128MB"))
    val v = CommitLog.append(slice(11, 20), t)
    assert(v == 3L)
    assert(rows(t) == (1L to 20L).toSet)
  }

  test("smallFileBytes is clamped to targetBytes/2 (misconfig cannot churn)") {
    val t = freshDir("clamp")
    CommitLog.append(slice(1, 10), t, mergeSchema = true)
    // smallFileBytes (1 GiB) > targetBytes (1 KiB): the clamp makes
    // "small" = 512 bytes, which no real parquet file is under — the
    // trigger can never fire, instead of rewriting N→N forever
    CommitLog.setProperties(spark, t, Map(
      "graft.autoCompact" -> "true",
      "graft.autoCompact.smallFileBytes" -> (1L << 30).toString,
      "graft.autoCompact.minFiles" -> "2",
      "graft.autoCompact.targetBytes" -> "1024"))
    CommitLog.append(slice(11, 20), t)
    CommitLog.append(slice(21, 30), t)
    assert(liveCount(t) == 3, "clamped threshold must not trigger")
  }
}
