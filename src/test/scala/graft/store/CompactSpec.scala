package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Small-file compaction: content must survive byte-for-byte, the file
  * count must actually shrink, and the op must be safe to re-run and to
  * point at a missing table. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): Store =
    Store(Files.createTempDirectory("graft_compact").toString)

  private def dataFiles(path: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
  }

  test("compact shrinks the file count and preserves every row") {
    val store = freshStore()
    val path = s"${store.root}/metadata"
    // 5 appends of 4 partitions each — the micro-batch small-file shape
    (0 until 5).foreach { i =>
      Store.append(
        spark.range(i * 100, (i + 1) * 100).repartition(4)
          .select(col("id"), (col("id") * 2).as("v")),
        path)
    }
    val before = dataFiles(path)
    assert(before.length >= 20, s"fixture should be fragmented, got ${before.length} files")
    val expected = spark.read.parquet(path).as[(Long, Long)].collect().sorted

    val ((fb, bb), (fa, ba)) =
      Store.compact(spark, store, "metadata", targetBytes = 1L << 30)
    assert(fb == before.length && fa == 1, s"expected 1 output file, got $fa of $fb")
    assert(bb > 0 && ba > 0)
    assert(dataFiles(path).length == 1)
    assert(spark.read.parquet(path).as[(Long, Long)].collect().sorted.sameElements(expected),
      "compaction changed the table contents")
  }

  test("compact splits to ceil(bytes/target) evenly-sized files") {
    val store = freshStore()
    val path = s"${store.root}/metadata"
    Store.append(spark.range(0, 5000).repartition(10).toDF("id"), path)
    val total = dataFiles(path).map(_.getLen).sum
    val target = total / 3 + 1 // → ceil < 4 output files, > 1
    val ((_, _), (fa, _)) = Store.compact(spark, store, "metadata", target)
    val nOut = ((total + target - 1) / target).toInt
    assert(fa == nOut, s"expected $nOut files, got $fa")
    assert(spark.read.parquet(path).count() == 5000)
  }

  test("compact of a missing table is a no-op; rerun is idempotent; lock is released") {
    val store = freshStore()
    assert(Store.compact(spark, store, "metadata") == ((0, 0L), (0, 0L)))
    val path = s"${store.root}/metadata"
    Store.append(spark.range(0, 10).toDF("id"), path)
    val r1 = Store.compact(spark, store, "metadata")
    val r2 = Store.compact(spark, store, "metadata")
    assert(r2._1._1 == 1 && r2._2._1 == 1, s"rerun not idempotent: $r2")
    assert(r1._2._2 == r2._2._2, "byte size drifted across reruns")
    // the lock file must be gone — a held lock would starve the planner
    val lock = new org.apache.hadoop.fs.Path(s"${store.root}/.lock_metadata")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(lock), "compaction leaked its table lock")
  }

  test("clusterBy compaction yields disjoint per-file value ranges") {
    val store = freshStore()
    val path = s"${store.root}/metadata"
    // shuffled ids across many appends — every file initially spans the
    // whole id domain, so nothing is file-skippable before compaction
    (0 until 4).foreach { i =>
      Store.append(
        spark.range(0, 2000).filter(col("id") % 4 === i).repartition(3).toDF("id"),
        path)
    }
    val total = dataFiles(path).map(_.getLen).sum
    Store.compact(spark, store, "metadata", total / 3 + 1, clusterBy = Some("id"))
    val files = dataFiles(path)
    assert(files.length > 1, "need several files to prove disjointness")
    // each output file must cover a range disjoint from every other —
    // that is what lets parquet min/max footer stats skip whole files
    val ranges = files.map { st =>
      val r = spark.read.parquet(st.getPath.toString)
        .agg(min("id"), max("id")).as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: ${ranges.mkString(", ")}")
      case _ =>
    }
    assert(spark.read.parquet(path).as[Long].collect().sorted.sameElements(0L until 2000L),
      "cluster compaction changed the table contents")
  }

  test("z-order compaction bounds per-file ranges on BOTH columns") {
    val store = freshStore()
    val path = s"${store.root}/metadata"
    // a 64×64 grid in row-major id order: single-column clustering on
    // `a` would leave every file spanning the FULL b domain
    Store.append(
      spark.range(0, 64 * 64).select(
        (col("id") % 64).as("a"), expr("id div 64").as("b")).repartition(8),
      path)
    val total = dataFiles(path).map(_.getLen).sum
    Store.compact(spark, store, "metadata", total / 4 + 1, clusterBy = Some("a,b"))
    val files = dataFiles(path)
    assert(files.length >= 4, s"need several files, got ${files.length}")
    // the property single-column clustering CANNOT give: min/max
    // footers prune files for predicates on EITHER column. Clustering
    // on `a` alone leaves every file spanning the full b domain, so a
    // b-filter skips nothing; z-order must leave some file entirely
    // outside a low-a window AND some file entirely outside a low-b
    // window. (Exact per-file rectangles depend on where the sampled
    // range partitioner cuts the curve, so this asserts prunability,
    // not cut positions.)
    val ranges = files.map { st =>
      spark.read.parquet(st.getPath.toString)
        .agg(min("a"), max("a"), min("b"), max("b"))
        .as[(Long, Long, Long, Long)].head()
    }
    assert(ranges.exists(_._1 > 15),
      s"no file skippable for a <= 15: ${ranges.mkString(", ")}")
    assert(ranges.exists(_._3 > 15),
      s"no file skippable for b <= 15: ${ranges.mkString(", ")}")
    assert(spark.read.parquet(path).count() == 64 * 64,
      "z-order compaction changed the table contents")
  }

  test("3-column z-order bounds per-file ranges on EVERY clustered column") {
    val store = freshStore()
    val path = s"${store.root}/metadata"
    // a 16×16×16 cube in row-major id order: clustering on any prefix
    // of the columns leaves files spanning the remaining dimensions
    Store.append(
      spark.range(0, 16 * 16 * 16).select(
        (col("id") % 16).as("a"),
        expr("(id div 16) % 16").as("b"),
        expr("id div 256").as("c")).repartition(8),
      path)
    val total = dataFiles(path).map(_.getLen).sum
    // 3 dimensions need ≥8 curve segments before the least-significant
    // interleaved column's top bit gets a cut — aim for ~12 files
    Store.compact(spark, store, "metadata", total / 12 + 1, clusterBy = Some("a,b,c"))
    val files = dataFiles(path)
    assert(files.length >= 8, s"need at least 8 files, got ${files.length}")
    val ranges = files.map { st =>
      spark.read.parquet(st.getPath.toString)
        .agg(min("a"), max("a"), min("b"), max("b"), min("c"), max("c"))
        .as[(Long, Long, Long, Long, Long, Long)].head()
    }
    // prunability in EVERY dimension: some file sits entirely outside
    // a low-window predicate on each of a, b, and c (exact rectangles
    // depend on the range partitioner's curve cuts)
    assert(ranges.exists(_._1 > 3),
      s"no file skippable for a <= 3: ${ranges.mkString(", ")}")
    assert(ranges.exists(_._3 > 3),
      s"no file skippable for b <= 3: ${ranges.mkString(", ")}")
    assert(ranges.exists(_._5 > 3),
      s"no file skippable for c <= 3: ${ranges.mkString(", ")}")
    assert(spark.read.parquet(path).count() == 16 * 16 * 16,
      "z-order compaction changed the table contents")
    // dimension overflow refuses loudly instead of silently wrapping
    val e = intercept[IllegalArgumentException] {
      ZOrder.zValueN(spark.range(2).select(
        col("id").as("a"), col("id").as("b"), col("id").as("c"),
        col("id").as("d"), col("id").as("e"), col("id").as("f"),
        col("id").as("g"), col("id").as("h")), Seq("a", "b", "c", "d", "e", "f", "g", "h"))
    }
    assert(e.getMessage.contains("z-bits"), e.getMessage)
  }

  test("an unlocked append landing between reconcile and park survives compaction") {
    // done/dlq/index writers do NOT take the table lock; round 5 could
    // silently delete a file they landed between the reconcile listing
    // and the park rename (it vanished with the parked directory). The
    // post-park re-list must fold it into the rewrite.
    val store = freshStore()
    val path = s"${store.root}/metadata"
    (0 until 3).foreach(i =>
      Store.append(spark.range(i * 100, (i + 1) * 100).toDF("id"), path))
    Store.testHookBeforePark = () =>
      Store.append(spark.range(1000, 1100).toDF("id"), path)
    try {
      Store.compact(spark, store, "metadata", targetBytes = 1L << 30)
    } finally Store.testHookBeforePark = () => ()
    val ids = spark.read.parquet(path).as[Long].collect().sorted
    assert(ids.length == 400 && ids.takeRight(100).sameElements(1000L until 1100L),
      s"the in-window append was lost: ${ids.length} rows")
  }

  test("compact self-heals a table parked by a crashed swap") {
    val store = freshStore()
    val path = s"${store.root}/metadata"
    Store.append(spark.range(0, 100).repartition(4).toDF("id"), path)
    // simulate a crash between park and publish: table parked, none live
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__pre_compact")))
    val ((fb, _), (fa, _)) = Store.compact(spark, store, "metadata")
    assert(fb == 4 && fa == 1, s"recovered table should compact 4→1, got $fb→$fa")
    assert(spark.read.parquet(path).count() == 100, "parked rows lost")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__pre_compact")))
  }

  test("recovery folds a post-crash re-created table into the parked original") {
    val store = freshStore()
    val path = s"${store.root}/metadata"
    Store.append(spark.range(0, 100).toDF("id"), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash between park and publish…
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__pre_compact")))
    // …then a writer re-creates the table with NEW rows (no marker)
    Store.append(spark.range(100, 120).toDF("id"), path)
    Store.compact(spark, store, "metadata")
    // both the parked 100 pre-crash rows and the 20 post-crash rows survive
    assert(spark.read.parquet(path).as[Long].collect().sorted.sameElements(0L until 120L),
      "recovery lost pre-crash or post-crash rows")
  }

  test("recovery trusts the _COMPACTED marker: a completed publish drops the parked twin") {
    val store = freshStore()
    val path = s"${store.root}/metadata"
    Store.append(spark.range(0, 50).toDF("id"), path)
    // first compact publishes the marker
    Store.compact(spark, store, "metadata")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_COMPACTED")))
    // simulate a crash AFTER publish but before parked cleanup: the
    // parked twin holds the same (stale) rows
    fs.mkdirs(new org.apache.hadoop.fs.Path(path + "__pre_compact"))
    Store.compact(spark, store, "metadata")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__pre_compact")))
    assert(spark.read.parquet(path).count() == 50, "live rows must be untouched")
  }

  test("compact refuses nested (hive-partitioned) layouts loudly") {
    val store = freshStore()
    spark.range(0, 100)
      .select(col("id"), (col("id") % 3).cast("string").as("part"))
      .write.partitionBy("part").parquet(s"${store.root}/metadata")
    val e = intercept[IllegalArgumentException] {
      Store.compact(spark, store, "metadata")
    }
    assert(e.getMessage.contains("nested"), e.getMessage)
  }

  test("compacting the queue under a checkpointed streaming worker stays idempotent") {
    graft.ingest.FixtureTree.ensure()
    val store = Store(Files.createTempDirectory("graft_compact_stream").toString)
    val obj = Files.createTempDirectory("graft_obj_cs").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_cs").toString
    graft.ingest.Ingest.run(spark, graft.ingest.FixtureTree.root, "ext/mov", 4, store)
    graft.plan.Plan.run(spark, store)
    val q1 = graft.streaming.StreamingJobs.executeStream(spark, store, obj, ckpt)
    q1.awaitTermination()
    val done1 = spark.read.parquet(store.taskDone).count()
    assert(done1 > 0)
    // compaction rewrites the queue into NEW file names; the
    // checkpointed file source treats them as unseen and replays every
    // task — the done anti-join must make that replay a no-op
    Store.compact(spark, store, "task_queue")
    val q2 = graft.streaming.StreamingJobs.executeStream(spark, store, obj, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(store.taskDone).count() == done1,
      "replay after queue compaction re-executed completed tasks")
    val dlqP = new org.apache.hadoop.fs.Path(store.dlq)
    val fs = dlqP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(dlqP) || spark.read.parquet(store.dlq).count() == 0,
      "queue compaction produced dead letters")
  }

  test("CLI compact subcommand reports the before/after census") {
    val store = freshStore()
    Store.append(spark.range(0, 50).repartition(5).toDF("id"), s"${store.root}/dlq")
    val out = graft.Cli.run(spark, Array("compact", "dlq", store.root, "128"))
    assert(out.contains(""""cmd":"compact"""") && out.contains(""""table":"dlq""""))
    assert(out.contains(""""files_before":5""") && out.contains(""""files_after":1"""), out)
  }
}
