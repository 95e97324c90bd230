package graft.sources

import graft.SparkSpec
import graft.store.CommitLog
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The logged table as a standard streaming SINK
  * (`df.writeStream.format("graftlog")`): Append mode must be
  * exactly-once across Spark-checkpoint replay (batch re-delivery
  * after a lost offset commit fences on the txn ledger), Complete
  * mode must be an atomic replay-idempotent replace, and Update mode
  * must be refused with directions. */
class GraftLogSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_sink_$tag").toString + "/t"

  private val schema = spark.range(0).select(col("id"), lit("s").as("v")).schema

  /** A 4-version source table: ids 0..39 over four appends. */
  private def buildSource(): String = {
    val src = fresh("src")
    (0 until 4).foreach(i =>
      CommitLog.append(spark.range(i * 10, i * 10 + 10)
        .select(col("id"), concat(lit("v"), col("id") % 3).as("v")), src))
    src
  }

  private def runAppend(src: String, sink: String, ckpt: String): Unit = {
    val q = spark.readStream.format("graftlog").schema(schema)
      .option("maxVersionsPerTrigger", 1L).load(src)
      .select("id", "v") // drop the CDC metadata pair
      .writeStream.format("graftlog")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start(sink)
    q.awaitTermination()
  }

  test("append sink: exactly-once across checkpoint replay") {
    val src = buildSource()
    val sink = fresh("app")
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    runAppend(src, sink, ckpt)
    assert(CommitLog.read(spark, sink, schema).count() == 40)
    // simulate the crash window: Spark landed the sink's commit but
    // lost its OWN offset commit — delete the newest checkpoint commit
    // file, forcing a replay of the last batch on restart
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs.listStatus(new org.apache.hadoop.fs.Path(ckpt, "commits"))
      .map(_.getPath).filterNot(_.getName.startsWith("."))
      .sortBy(_.getName)
    assert(commits.nonEmpty)
    fs.delete(commits.last, false)
    runAppend(src, sink, ckpt)
    val out = CommitLog.read(spark, sink, schema)
    assert(out.count() == 40, "replayed batch was double-applied")
    assert(out.select("id").as[Long].collect().toSet == (0L until 40L).toSet)
    // and new source data still flows after the replay
    CommitLog.append(spark.range(100, 105)
      .select(col("id"), lit("v9").as("v")), src)
    runAppend(src, sink, ckpt)
    assert(CommitLog.read(spark, sink, schema).count() == 45)
  }

  test("complete sink: streaming aggregation lands as atomic replace") {
    val src = buildSource()
    val sink = fresh("comp")
    val ckpt = Files.createTempDirectory("graft_sink_ckpt_c").toString
    def run(): Unit = {
      val q = spark.readStream.format("graftlog").schema(schema)
        .option("maxVersionsPerTrigger", 1L).load(src)
        .groupBy("v").agg(count(lit(1)).as("n"))
        .writeStream.format("graftlog")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start(sink)
      q.awaitTermination()
    }
    run()
    val expected = CommitLog.read(spark, src, schema)
      .groupBy("v").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    val aggSchema = spark.range(0)
      .select(lit("s").as("v"), lit(0L).as("n")).schema
    assert(CommitLog.read(spark, sink, aggSchema)
      .as[(String, Long)].collect().toSet == expected)
    // replay the final trigger: the overwrite must be idempotent
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs.listStatus(new org.apache.hadoop.fs.Path(ckpt, "commits"))
      .map(_.getPath).filterNot(_.getName.startsWith(".")).sortBy(_.getName)
    fs.delete(commits.last, false)
    run()
    assert(CommitLog.read(spark, sink, aggSchema)
      .as[(String, Long)].collect().toSet == expected)
  }

  test("update sink: keyed upsert, exactly-once across checkpoint replay") {
    val src = buildSource()
    val sink = fresh("upd")
    val ckpt = Files.createTempDirectory("graft_sink_ckpt_u").toString
    val aggSchema = spark.range(0)
      .select(lit("s").as("v"), lit(0L).as("n")).schema
    def run(): Unit = {
      val q = spark.readStream.format("graftlog").schema(schema)
        .option("maxVersionsPerTrigger", 1L).load(src)
        .groupBy("v").agg(count(lit(1)).as("n"))
        .writeStream.format("graftlog")
        .outputMode("update")
        .option("keys", "v")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start(sink)
      q.awaitTermination()
    }
    run()
    def expected = CommitLog.read(spark, src, schema)
      .groupBy("v").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(CommitLog.read(spark, sink, aggSchema)
      .as[(String, Long)].collect().toSet == expected,
      "update sink diverged from the batch aggregation")
    // exactly one row per key despite 4 incremental upserts
    assert(CommitLog.read(spark, sink, aggSchema).groupBy("v").count()
      .filter(col("count") > 1).count() == 0)
    // replay the final trigger (lost offset commit): the keyed upsert
    // must fence on the ledger, not double-apply
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs.listStatus(new org.apache.hadoop.fs.Path(ckpt, "commits"))
      .map(_.getPath).filterNot(_.getName.startsWith(".")).sortBy(_.getName)
    fs.delete(commits.last, false)
    run()
    assert(CommitLog.read(spark, sink, aggSchema)
      .as[(String, Long)].collect().toSet == expected,
      "replayed update batch was double-applied")
    // new source data flows through as incremental key updates
    CommitLog.append(spark.range(100, 106)
      .select(col("id"), lit("v0").as("v")), src)
    run()
    assert(CommitLog.read(spark, sink, aggSchema)
      .as[(String, Long)].collect().toSet == expected)
  }

  test("update mode without keys is refused; partitionBy is refused") {
    val src = buildSource()
    val e = intercept[Exception] {
      spark.readStream.format("graftlog").schema(schema).load(src)
        .groupBy("v").agg(count(lit(1)).as("n"))
        .writeStream.format("graftlog")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sink_ckpt_u2").toString)
        .start(fresh("upd2"))
    }
    assert(e.getMessage.contains("keys") ||
      Option(e.getCause).exists(_.getMessage.contains("keys")))
    val e2 = intercept[Exception] {
      spark.readStream.format("graftlog").schema(schema).load(src)
        .select("id", "v")
        .writeStream.format("graftlog")
        .partitionBy("v")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sink_ckpt_p").toString)
        .start(fresh("part"))
    }
    assert(e2.getMessage.contains("partitionBy") ||
      Option(e2.getCause).exists(_.getMessage.contains("partitionBy")))
  }
}
