package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Selective OPTIMIZE ([[CommitLog.optimize]]): bin-packs ONLY
  * small files, absorbs ONLY vectored files, honors WHERE scoping
  * from log-carried stats, proves no-ops, and leaves right-sized
  * files byte-identical — the difference between a maintenance verb
  * and a full-table rewrite at 100 TB. */
class OptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_opt").toString + "/t"

  private val schema = spark.range(0).toDF("id").schema

  private def files(t: String): Set[String] =
    CommitLog.liveFiles(spark, t)._2.toSet

  private def sizeOf(t: String, f: String): Long = {
    val p = new org.apache.hadoop.fs.Path(t, f)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
  }

  test("bin-packing touches only small files; right-sized files keep identity") {
    val t = freshTable()
    // one comfortably-large file + three tiny ones
    CommitLog.append(spark.range(0, 200000).toDF("id").coalesce(1), t)
    val big = files(t)
    assert(big.size == 1)
    CommitLog.append(Seq(1000001L).toDF("id").coalesce(1), t)
    CommitLog.append(Seq(1000002L).toDF("id").coalesce(1), t)
    CommitLog.append(Seq(1000003L).toDF("id").coalesce(1), t)
    val bigBytes = sizeOf(t, big.head)
    val target = bigBytes - 1 // big file is right-sized, tiny ones are not
    val v = CommitLog.optimize(spark, t, target)
    val after = files(t)
    assert(after.contains(big.head), "optimize rewrote a right-sized file")
    assert(after.size == 2, s"tiny files not packed into one: $after")
    assert(CommitLog.read(spark, t, schema).count() == 200003)
    // running it again is a proven no-op (one small packed file, no vectors)
    assert(CommitLog.optimize(spark, t, target) == v)
  }

  test("a vectored file is absorbed even when larger than target") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 200000).toDF("id").coalesce(1), t)
    val big = files(t).head
    CommitLog.deleteWhere(spark, t, schema, col("id") < 10,
      deletionVectors = true)
    // big file is right-sized for the target (size >= target), but
    // carries a vector — absorption must still claim it
    val v0 = CommitLog.liveFiles(spark, t)._1
    CommitLog.optimize(spark, t, targetBytes = sizeOf(t, big) - 1)
    val (_, entries) = CommitLog.liveFilesFull(spark, t)
    assert(!entries.exists(_.name == big), "vectored file not absorbed")
    assert(entries.forall(_.dv.isEmpty))
    assert(CommitLog.read(spark, t, schema).count() == 199990)
    assert(CommitLog.liveFiles(spark, t)._1 == v0 + 1)
  }

  test("WHERE scoping from log stats: out-of-range files are untouched") {
    val t = freshTable()
    // three tiny files: two in the low id range, one in the high range
    CommitLog.append(Seq(1L, 2L).toDF("id").coalesce(1), t)
    CommitLog.append(Seq(3L, 4L).toDF("id").coalesce(1), t)
    CommitLog.append(Seq(9001L, 9002L).toDF("id").coalesce(1), t)
    val highFile = files(t).toSeq.sortBy(identity).last
    val before = files(t)
    val high = before.filter { f =>
      CommitLog.liveFilesFull(spark, t)._2
        .find(_.name == f).flatMap(_.stats).exists(_.contains("9001")) }
    assert(high.size == 1)
    CommitLog.optimize(spark, t, targetBytes = 1024 * 1024,
      where = Some(col("id") < 100))
    val after = files(t)
    assert(after.contains(high.head), "optimize touched an out-of-scope file")
    assert(after.size == 2, s"low-range files not packed: $after")
    assert(CommitLog.read(spark, t, schema).as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 9001L, 9002L))
    // suppress unused warning
    assert(highFile.nonEmpty)
  }

  test("an optimizer losing a race to a concurrent rewrite re-plans and terminates") {
    val t = freshTable()
    (0 until 4).foreach(i =>
      CommitLog.append(spark.range(i * 25, (i + 1) * 25).toDF("id").coalesce(1), t))
    // a MOR delete so the competitor's interleave is a ROW-CHANGING
    // conflict, not just a version bump
    var raced = false
    val racy = new AtomicPublisher {
      def publish(fs: org.apache.hadoop.fs.FileSystem,
          logDir: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path,
          content: String): Boolean = {
        if (!raced) {
          raced = true
          // the competitor lands a FULL compaction between this
          // optimizer's plan and its publish: every planned remove is
          // now gone — the old behavior threw ConcurrentModification
          CommitLog.compact(spark, t, targetBytes = Long.MaxValue)
        }
        RenameOrLinkPublisher.publish(fs, logDir, dst, content)
      }
    }
    val v = CommitLog.optimize(spark, t, targetBytes = Long.MaxValue,
      publisher = racy)
    assert(raced, "fixture no longer exercises the race")
    // both maintenance passes terminated; the table equals one of the
    // two serial orders (here: compact then optimize-as-no-op-or-repack)
    assert(CommitLog.read(spark, t, schema).as[Long].collect().toSet ==
      (0L until 100L).toSet)
    // versions are contiguous — no gap, no orphan version
    val latest = CommitLog.liveFiles(spark, t)._1
    assert(v <= latest)
    (1L to latest).foreach(ver =>
      CommitLog.liveFiles(spark, t, asOf = ver)) // throws on a gap
    // too-contended tables still fail loudly: a contender that ALWAYS
    // re-vectors a planned input between plan and publish (a MOR
    // delete per attempt) exhausts the bounded retries
    (0 until 3).foreach(i =>
      CommitLog.append(spark.range(200 + i * 10, 210 + i * 10).toDF("id").coalesce(1), t))
    val always = new AtomicPublisher {
      private var k = 0
      def publish(fs: org.apache.hadoop.fs.FileSystem,
          logDir: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path,
          content: String): Boolean = {
        k += 1
        CommitLog.deleteWhere(spark, t, schema, col("id") === lit(200L + k),
          deletionVectors = true)
        RenameOrLinkPublisher.publish(fs, logDir, dst, content)
      }
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      CommitLog.optimize(spark, t, targetBytes = Long.MaxValue, publisher = always)
    }
    assert(e.getMessage.contains("consecutive conflicts"))
  }

  test("SQL: selective by default, FULL forces the rewrite, FULL+WHERE refused") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 100000).toDF("id").coalesce(1), t)
    CommitLog.append(Seq(7777777L).toDF("id").coalesce(1), t)
    val big = files(t).maxBy(sizeOf(t, _))
    val target = sizeOf(t, big) - 1
    GraftSql.execute(spark, s"OPTIMIZE graftlog.`$t` TARGET $target")
    assert(files(t).contains(big), "plain OPTIMIZE rewrote a right-sized file")
    GraftSql.execute(spark, s"OPTIMIZE graftlog.`$t` FULL TARGET $target")
    assert(!files(t).contains(big), "OPTIMIZE FULL left the live set alone")
    assert(CommitLog.read(spark, t, schema).count() == 100001)
    val e = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, s"OPTIMIZE graftlog.`$t` FULL WHERE id < 5")
    }
    assert(e.getMessage.contains("selective"))
  }
}
