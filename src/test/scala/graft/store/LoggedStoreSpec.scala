package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The commit-log table layer's ACID claims, exercised concretely:
  * atomic visibility, multi-writer serialization without a lock, the
  * no-lost-update property under append-during-compact, and orphan
  * reclamation. */
class LoggedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_logged").toString + "/t"

  private val schema = spark.range(0).toDF("id").schema

  test("append/read round trip; files without a commit are invisible") {
    val t = freshTable()
    assert(CommitLog.read(spark, t, schema).count() == 0)
    val v1 = CommitLog.append(spark.range(0, 100).toDF("id"), t)
    assert(v1 == 1L)
    assert(CommitLog.read(spark, t, schema).count() == 100)
    // a writer that crashed after landing a data file but before its
    // commit: the file sits in the directory but is NOT in the log
    spark.range(500, 600).toDF("id").coalesce(1)
      .write.parquet(t + "/_staging_crashed")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(t + "/_staging_crashed"))
      .filter(_.getPath.getName.startsWith("part-")).head.getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(t, "crashed-orphan.parquet"))
    assert(CommitLog.read(spark, t, schema).count() == 100,
      "an uncommitted data file leaked into the read")
    // vacuum(0) reclaims both the orphan and the staging dir
    val swept = CommitLog.vacuum(spark, t, minAgeMs = 0)
    assert(swept.contains("crashed-orphan.parquet") &&
      swept.exists(_.startsWith("_staging_")))
    assert(CommitLog.read(spark, t, schema).count() == 100)
  }

  test("eight lockless concurrent writers: every row survives, versions serialize") {
    val t = freshTable()
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        CommitLog.append(spark.range(i * 100, (i + 1) * 100).toDF("id"), t); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val (version, files) = CommitLog.liveFiles(spark, t)
    assert(version == 8L, s"8 appends must win 8 distinct versions, got $version")
    assert(files.nonEmpty)
    val ids = CommitLog.read(spark, t, schema).as[Long].collect().sorted
    assert(ids.sameElements(0L until 800L), s"lost update: ${ids.length} of 800 rows")
  }

  test("compact: one atomic commit, contents identical, old files reclaimed by vacuum") {
    val t = freshTable()
    (0 until 5).foreach(i =>
      CommitLog.append(spark.range(i * 10, (i + 1) * 10).repartition(3).toDF("id"), t))
    val before = CommitLog.liveFiles(spark, t)._2
    assert(before.size >= 10, s"fixture should be fragmented: ${before.size}")
    CommitLog.compact(spark, t, targetBytes = 1L << 30)
    val (_, after) = CommitLog.liveFiles(spark, t)
    assert(after.size == 1, s"expected 1 compacted file, got ${after.size}")
    assert(CommitLog.read(spark, t, schema).as[Long].collect().sorted
      .sameElements(0L until 50L))
    // the superseded files still exist on disk until vacuum
    val swept = CommitLog.vacuum(spark, t, minAgeMs = 0)
    assert(before.forall(swept.contains), "vacuum missed superseded files")
    assert(CommitLog.read(spark, t, schema).count() == 50)
  }

  test("checkpoints bound replay: reads survive deletion of all pre-checkpoint commits") {
    val t = freshTable()
    (0 until 25).foreach(i =>
      CommitLog.append(spark.range(i, i + 1).repartition(1).toDF("id"), t))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = new org.apache.hadoop.fs.Path(t, "_graft_log")
    val ckpts = fs.listStatus(log).map(_.getPath.getName)
      .filter(_.endsWith(".checkpoint")).sorted
    assert(ckpts.length == 2 && ckpts.last.startsWith("0" * 18 + "20"),
      s"expected checkpoints at v10 and v20, got ${ckpts.mkString(", ")}")
    // time travel across a checkpoint boundary: ckpt10 + commits 11..15
    assert(CommitLog.read(spark, t, schema, asOf = 15L).count() == 15)
    // the load-bearing property: replay does NOT need the commits a
    // checkpoint subsumes — delete every commit file <= v20 and the
    // current read must be unchanged (ckpt20 + commits 21..25)
    fs.listStatus(log).foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(".commit") && n.stripSuffix(".commit").toLong <= 20)
        fs.delete(st.getPath, false)
    }
    val ids = CommitLog.read(spark, t, schema).as[Long].collect().sorted
    assert(ids.sameElements(0L until 25L),
      s"replay depended on checkpointed commits: ${ids.length} rows")
    // a time-travel read whose commits were pruned must THROW, not
    // silently answer with the older checkpoint's snapshot
    intercept[IllegalStateException] {
      CommitLog.liveFiles(spark, t, asOf = 15L)
    }
    // and new commits must number PAST the checkpoint base even though
    // the pre-checkpoint commit files are gone — a commits-only version
    // counter would restart at 1 and make every new append invisible
    val v = CommitLog.append(spark.range(1000, 1001).repartition(1).toDF("id"), t)
    assert(v == 26L, s"post-prune append won version $v, expected 26")
    assert(CommitLog.read(spark, t, schema).count() == 26)
  }

  test("time travel: asOf reads reproduce each committed snapshot until vacuumed") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 100).toDF("id"), t)          // v1
    CommitLog.append(spark.range(100, 150).toDF("id"), t)        // v2
    CommitLog.compact(spark, t, targetBytes = 1L << 30)          // v3
    assert(CommitLog.read(spark, t, schema, asOf = 1L).count() == 100)
    assert(CommitLog.read(spark, t, schema, asOf = 2L).count() == 150)
    assert(CommitLog.read(spark, t, schema).count() == 150)
    // vacuum reclaims the pre-compaction files — old snapshots are gone
    // (the standard retention trade), the current one is untouched
    CommitLog.vacuum(spark, t, minAgeMs = 0)
    assert(CommitLog.read(spark, t, schema).count() == 150)
    intercept[Exception] { CommitLog.read(spark, t, schema, asOf = 1L).count() }
  }

  test("two rewrites of the same live set: the second fails loudly, never doubles the table") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 100).toDF("id"), t)
    val (_, oldFiles) = CommitLog.liveFiles(spark, t)
    // both "compactors" read the same live set; the first rewrite wins
    CommitLog.compact(spark, t, targetBytes = 1L << 30)
    // the second tries to commit a rewrite whose inputs are gone — a
    // blind retry here would ADD its rewrite on top of the winner's,
    // doubling every row
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commit(spark, t, adds = Seq("stale-rewrite.parquet"), removes = oldFiles)
    }
    assert(CommitLog.read(spark, t, schema).count() == 100,
      "the conflicting rewrite changed the table")
  }

  test("an append committing in the middle of a compaction is never lost") {
    val t = freshTable()
    (0 until 3).foreach(i =>
      CommitLog.append(spark.range(i * 10, (i + 1) * 10).toDF("id"), t))
    // replay compact's protocol by hand so an append can interleave at
    // the worst point — between the rewrite's read and its commit
    // (with the unlogged layout this exact window was the lost-update
    // the advisory lock file existed to prevent)
    val (_, oldFiles) = CommitLog.liveFiles(spark, t)
    val staging = t + "/_staging_test"
    spark.read.parquet(oldFiles.map(f => s"$t/$f"): _*)
      .repartition(1).write.parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .filter(_.getPath.getName.startsWith("part-")).head.getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(t, "compacted-0.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    // the interleaved append wins the next version FIRST
    CommitLog.append(spark.range(1000, 1010).toDF("id"), t)
    // the compaction commits after — removing only ITS input files
    CommitLog.commit(spark, t, adds = Seq("compacted-0.parquet"), removes = oldFiles)
    val ids = CommitLog.read(spark, t, schema).as[Long].collect().sorted
    assert(ids.sameElements((0L until 30L) ++ (1000L until 1010L)),
      s"append lost across compaction: ${ids.length} rows")
  }
}
