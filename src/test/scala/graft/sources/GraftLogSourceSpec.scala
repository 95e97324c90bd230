package graft.sources

import graft.SparkSpec
import graft.store.{CdcStream, CommitLog}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The logged table as a STANDARD Spark streaming source
  * (`spark.readStream.format("graftlog")`): offsets are commit
  * versions checkpointed by Spark itself, any sink consumes the feed,
  * rate limiting survives a restart, and exactly-once holds when the
  * sink lands batches through the txn= ledger
  * (CdcStream.applyChangesOnce) — including a crash AFTER the sink
  * commit but BEFORE Spark's offset commit, the replay-duplication
  * worst case. */
class GraftLogSourceSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_dsv2_$tag").toString + "/t"

  private val schema = Seq((0L, "v")).toDF("id", "v").schema
  private val sinkSchema = Seq((0L, "v", 0)).toDF("id", "v", "w").schema

  private def transform(df: DataFrame): DataFrame =
    df.filter(col("id") % 3 =!= 0)
      .select(col("id"), col("v"), length(col("v")).as("w"))

  /** v1: 0..99 "a"; v2: 100..199 "b"; v3: DELETE id%10==4;
    * v4: merge (update 20..39 -> "m", insert 500..509 "m"). */
  private def buildSource(): String = {
    val t = fresh("src")
    CommitLog.append((0L until 100L).map(i => (i, "a")).toDF("id", "v"), t)
    CommitLog.append((100L until 200L).map(i => (i, "b")).toDF("id", "v"), t)
    CommitLog.deleteWhere(spark, t, schema, col("id") % 10 === 4)
    CommitLog.merge(spark, t, schema,
      ((20L until 40L).map(i => (i, "m")) ++ (500L until 510L).map(i => (i, "m")))
        .toDF("id", "v"), Seq("id"))
    t
  }

  private def sinkRows(t: String): Set[(Long, String, Int)] =
    CommitLog.read(spark, t, sinkSchema).as[(Long, String, Int)].collect().toSet

  private def expected(src: String): Set[(Long, String, Int)] =
    transform(CommitLog.read(spark, src, schema))
      .as[(Long, String, Int)].collect().toSet

  private def runStream(src: String, sink: String, ckpt: String,
      queryId: String, boomAtBatch: Long = -1L): Unit = {
    val q = spark.readStream.format("graftlog")
      .schema(schema)
      .option("maxVersionsPerTrigger", 1L)
      .load(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        CdcStream.applyChangesOnce(spark, sink, sinkSchema, Seq("id"),
          batch.toDF(), queryId, batchId, transform)
        // the crash lands AFTER the sink's durable commit and BEFORE
        // Spark commits the offset — the batch WILL replay
        if (batchId == boomAtBatch)
          throw new RuntimeException("injected post-commit crash")
        ()
      }
      .start()
    q.awaitTermination()
  }

  test("readStream drain ≡ batch recompute; one micro-batch per version under the rate limit") {
    val src = buildSource()
    val sink = fresh("sink")
    val ckpt = Files.createTempDirectory("graft_ck").toString
    runStream(src, sink, ckpt, "glogspec1")
    assert(sinkRows(sink) == expected(src),
      "streamed feed must equal the batch transform of the final snapshot")
    // maxVersionsPerTrigger=1 over 4 source versions = 4 sink commits,
    // each carrying its txn claim
    assert(CommitLog.lastTxnBatch(spark, sink, "glogspec1") == 3L,
      "expected batches 0..3, one per source version")
    // caught up: a second run from the same checkpoint moves nothing
    runStream(src, sink, ckpt, "glogspec1")
    assert(sinkRows(sink) == expected(src))
    assert(CommitLog.lastTxnBatch(spark, sink, "glogspec1") == 3L)
  }

  test("maxBytesPerTrigger: byte-budgeted admission from log-carried sizes, soft max") {
    val src = fresh("src")
    // four appends of known, log-carried sizes
    (0 until 4).foreach(k => CommitLog.append(
      (k * 100L until k * 100L + 100L).map(i => (i, "x")).toDF("id", "v"), src))
    val perV = CommitLog.addedBytesByVersion(spark, src, 0L, 4L)
    assert(perV.map(_._1) == Seq(1L, 2L, 3L, 4L) && perV.forall(_._2.isDefined),
      s"expected recorded sizes for all four versions: $perV")
    val sizes = perV.map(_._2.get)
    def drain(budget: Long, tag: String): Long = {
      val sink = fresh("sink"); val ckpt = Files.createTempDirectory("graft_ckb").toString
      spark.readStream.format("graftlog").schema(schema)
        .option("maxBytesPerTrigger", budget)
        .load(src)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          CommitLog.appendOnce(batch.toDF().select(col("id"), col("v")),
            sink, tag, batchId)
          ()
        }
        .start().awaitTermination()
      assert(CommitLog.read(spark, sink, schema).count() == 400L,
        "byte budgeting must never lose rows")
      CommitLog.lastTxnBatch(spark, sink, tag) + 1 // batches drained
    }
    // budget = two appends (+1 slack) → two versions per batch → 2 batches
    assert(drain(sizes.take(2).sum + 1, "bytes2") == 2L)
    // budget below ONE append → the soft max still admits one per batch
    assert(drain(sizes.head / 2, "bytes1") == 4L)
  }

  test("admitByBytes stops reading at the first over-budget version (O(admitted) log I/O)") {
    val src = fresh("src")
    (0 until 4).foreach(k => CommitLog.append(
      (k * 100L until k * 100L + 100L).map(i => (i, "x")).toDF("id", "v"), src))
    val sizes = CommitLog.addedBytesByVersion(spark, src, 0L, 4L).map(_._2.get)
    assert(CommitLog.admitByBytes(spark, src, 0L, 4L, sizes.head / 2) == Some(1L),
      "soft max: the first candidate admits alone even under budget")
    assert(CommitLog.admitByBytes(spark, src, 0L, 4L, sizes.take(2).sum + 1) == Some(2L))
    assert(CommitLog.admitByBytes(spark, src, 0L, 4L, Long.MaxValue / 2) == Some(4L))
    // delete v3's commit file: a walk that stops at v2 (over budget)
    // must never have opened it — same answers as before the delete —
    // while a walk whose budget reaches v3 hits the gap and returns
    // None (admit-unbudgeted → the loud FeedGapException contract)
    val v3 = new org.apache.hadoop.fs.Path(src, f"_graft_log/${3L}%020d.commit")
    v3.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(v3, false)
    assert(CommitLog.admitByBytes(spark, src, 0L, 4L, sizes.head / 2) == Some(1L),
      "early stop proven: the pruned v3 was never read")
    assert(CommitLog.admitByBytes(spark, src, 0L, 4L, sizes.take(2).sum + 1).isEmpty,
      "a budget whose walk reaches the pruned v3 sees the gap (admit unbudgeted)")
    assert(CommitLog.admitByBytes(spark, src, 0L, 4L, Long.MaxValue / 2).isEmpty,
      "a gap inside the walked prefix admits the window unbudgeted")
    assert(CommitLog.admitByBytes(spark, src, 2L, 4L, Long.MaxValue / 2).isEmpty,
      "a gap at the prefix start is seen immediately")
  }

  test("byte admission: a CDC-fed version is opaque and admits alone; values stay exact") {
    val src = fresh("src")
    CommitLog.append((0L until 100L).map(i => (i, "a")).toDF("id", "v"), src)
    CommitLog.append((100L until 200L).map(i => (i, "b")).toDF("id", "v"), src)
    // v3 feeds its CDC change files, whose sizes the log does not
    // carry — the budget must treat it as opaque, not charge the
    // never-fed rewrite adds
    CommitLog.deleteWhere(spark, src, schema, col("id") % 10 === 4)
    val perV = CommitLog.addedBytesByVersion(spark, src, 0L, 3L)
    assert(perV.map(_._1) == Seq(1L, 2L, 3L))
    assert(perV.take(2).forall(_._2.isDefined) && perV(2)._2.isEmpty,
      s"CDC version must be opaque: $perV")
    val sink = fresh("sink"); val ckpt = Files.createTempDirectory("graft_ckc").toString
    spark.readStream.format("graftlog").schema(schema)
      .option("maxBytesPerTrigger", Long.MaxValue / 2) // huge, but set
      .load(src)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        CdcStream.applyChangesOnce(spark, sink, sinkSchema, Seq("id"),
          batch.toDF(), "bytescdc", batchId, transform)
        ()
      }
      .start().awaitTermination()
    assert(sinkRows(sink) == expected(src),
      "opaque-version admission lost or doubled rows")
    // the opaque v3 admitted ALONE: appends rode one batch (budget
    // huge), the CDC version needed its own
    assert(CommitLog.lastTxnBatch(spark, sink, "bytescdc") == 1L,
      "expected 2 batches: [v1,v2] then [v3] alone")
  }

  test("crash after the sink commit, restart from Spark's checkpoint: replayed batch fences, nothing doubles") {
    val src = buildSource()
    val sink = fresh("sink")
    val ckpt = Files.createTempDirectory("graft_ck").toString
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(src, sink, ckpt, "glogspec2", boomAtBatch = 1L)
    }
    assert(e.getMessage.contains("injected"), e.getMessage)
    // batch 1's sink commit IS durable — only Spark's offset is behind
    assert(CommitLog.lastTxnBatch(spark, sink, "glogspec2") == 1L)
    runStream(src, sink, ckpt, "glogspec2")
    assert(sinkRows(sink) == expected(src),
      "the replayed batch double-applied or the restart lost an increment")
    assert(CommitLog.lastTxnBatch(spark, sink, "glogspec2") == 3L)
  }

  test("arbitrary sink: the feed lands in a memory table with CDC columns intact") {
    val src = fresh("src")
    CommitLog.append((0L until 50L).map(i => (i, "a")).toDF("id", "v"), src)
    CommitLog.append((50L until 80L).map(i => (i, "b")).toDF("id", "v"), src)
    CommitLog.deleteWhere(spark, src, schema, col("id") < 5)
    val q = spark.readStream.format("graftlog")
      .schema(schema)
      .load(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("graft_ck").toString)
      .format("memory").queryName("glog_mem")
      .start()
    q.awaitTermination()
    val fed = spark.table("glog_mem")
    assert(fed.columns.toSeq == Seq("id", "v", "_change_type", "_commit_version"))
    // 80 inserts + 5 delete rows, versions tagged
    assert(fed.count() == 85)
    assert(fed.filter(col("_change_type") === "delete").count() == 5)
    assert(fed.filter(col("_commit_version") === 3L).count() == 5)
  }

  test("startingVersion skips history; schema inference reads the live files") {
    val src = fresh("src")
    CommitLog.append((0L until 50L).map(i => (i, "a")).toDF("id", "v"), src)
    CommitLog.append((50L until 80L).map(i => (i, "b")).toDF("id", "v"), src)
    // no .schema(...): inferred from the newest live file
    val q = spark.readStream.format("graftlog")
      .option("startingVersion", 1L)
      .load(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("graft_ck").toString)
      .format("memory").queryName("glog_mem2")
      .start()
    q.awaitTermination()
    val fed = spark.table("glog_mem2")
    assert(fed.count() == 30, "startingVersion=1 must feed only (1, latest]")
    assert(fed.select(min("id"), max("id")).as[(Long, Long)].head() == ((50L, 79L)))
  }
}
