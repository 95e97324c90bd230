package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** CONVERT TO GRAFT ([[CommitLog.convertParquet]]): adopt a plain
  * parquet directory in place — zero rewrites, full protocol from the
  * first post-convert query (stats, metadata COUNT, DML, time travel,
  * vacuum safety), loud refusals for the layouts adoption cannot
  * represent. */
class ConvertSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_convert").toString + "/t"

  private def dataFiles(t: String): Set[String] = {
    val hp = new org.apache.hadoop.fs.Path(t)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(hp).collect {
      case st if st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") => st.getPath.getName
    }.toSet
  }

  test("adopts a plain parquet dir in place: same bytes, full protocol from query one") {
    val t = freshDir()
    (1L to 300L).map(i => (i, s"d$i")).toDF("id", "s")
      .write.mode("append").parquet(t)
    (301L to 500L).map(i => (i, s"d$i")).toDF("id", "s")
      .write.mode("append").parquet(t)
    val before = dataFiles(t)
    val v = CommitLog.convertParquet(spark, t)
    assert(v == 1L)
    assert(dataFiles(t) == before, "convert must not move or rewrite a byte")
    // the log serves the adopted data
    val got = spark.read.format("graftlog").load(t)
    assert(got.count() == 500L)
    // stats landed with the adoption: COUNT/MIN/MAX are metadata-only
    val agg = spark.read.format("graftlog").load(t)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    assert(agg.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
    }.isEmpty, s"adopted stats should feed the metadata aggregate")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 500L && r.getLong(1) == 1L && r.getLong(2) == 500L)
    // the schema ledger was stamped
    assert(CommitLog.tableSchema(spark, t).fieldNames.toSeq == Seq("id", "s"))
    // DML works; time travel reaches the adopted snapshot; vacuum
    // keeps every adopted (referenced) file
    CommitLog.deleteWhere(spark, t, CommitLog.tableSchema(spark, t),
      col("id") <= 100)
    assert(spark.read.format("graftlog").load(t).count() == 400L)
    assert(CommitLog.read(spark, t, CommitLog.tableSchema(spark, t), asOf = 1L)
      .count() == 500L)
    CommitLog.vacuum(spark, t, minAgeMs = Long.MaxValue / 2)
    assert(spark.read.format("graftlog").load(t).count() == 400L)
  }

  test("heterogeneous file generations adopt under the union schema, null-filled") {
    val t = freshDir()
    (1L to 50L).map(i => Tuple1(i)).toDF("id").write.mode("append").parquet(t)
    (51L to 80L).map(i => (i, s"x$i")).toDF("id", "s")
      .write.mode("append").parquet(t)
    CommitLog.convertParquet(spark, t)
    val got = spark.read.format("graftlog").load(t)
    assert(got.schema.fieldNames.sorted.toSeq == Seq("id", "s"))
    assert(got.count() == 80L)
    assert(got.filter(col("s").isNull).count() == 50L)
  }

  test("extension-less parquet adopts; an unreadable file refuses the WHOLE convert") {
    val t = freshDir()
    (1L to 60L).map(i => (i, s"n$i")).toDF("id", "s")
      .write.mode("append").parquet(t)
    val hp = new org.apache.hadoop.fs.Path(t)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a non-Spark writer's file: valid parquet, NO .parquet extension —
    // skipping it would undercount the table and let vacuum delete it
    val part = fs.listStatus(hp)
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new org.apache.hadoop.fs.Path(hp, "extensionless-data"),
      false, spark.sparkContext.hadoopConfiguration)
    val extRows = spark.read.parquet(part.toString).count()
    CommitLog.convertParquet(spark, t)
    assert(spark.read.format("graftlog").load(t).count() == 60L + extRows,
      "extension-less parquet must adopt, not silently drop")
    // ...and a genuinely unreadable file refuses adoption loudly
    val bad = freshDir()
    (1L to 10L).toDF("id").write.mode("append").parquet(bad)
    val out = fs.create(new org.apache.hadoop.fs.Path(bad, "junk.txt"), true)
    out.write("not parquet".getBytes); out.close()
    val e = intercept[IllegalArgumentException](CommitLog.convertParquet(spark, bad))
    assert(e.getMessage.contains("junk.txt"), e.getMessage)
  }

  test("refusals: partitioned layout, already-logged, empty, missing") {
    val part = freshDir()
    (1L to 20L).map(i => (i, i % 3)).toDF("id", "k")
      .write.partitionBy("k").parquet(part)
    val e = intercept[IllegalArgumentException](
      CommitLog.convertParquet(spark, part))
    assert(e.getMessage.contains("partitioned"), e.getMessage)

    val logged = freshDir()
    (1L to 5L).toDF("id").write.format("graftlog").mode("append").save(logged)
    intercept[IllegalArgumentException](CommitLog.convertParquet(spark, logged))

    val empty = freshDir()
    new org.apache.hadoop.fs.Path(empty)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(empty))
    intercept[IllegalArgumentException](CommitLog.convertParquet(spark, empty))

    intercept[IllegalArgumentException](
      CommitLog.convertParquet(spark, freshDir() + "/nope"))
  }

  test("CONVERT TO GRAFT routes through GraftSql and plain spark.sql") {
    val t1 = freshDir(); val t2 = freshDir()
    (1L to 30L).map(i => (i, s"a$i")).toDF("id", "s")
      .write.mode("append").parquet(t1)
    (1L to 40L).map(i => (i, s"b$i")).toDF("id", "s")
      .write.mode("append").parquet(t2)
    val out = GraftSql.execute(spark, s"CONVERT TO GRAFT graftlog.`$t1`")
    assert(out.as[(String, Long)].collect().toSeq == Seq((t1, 1L)))
    // the grammar-rejected verb lands on the injected parser
    spark.sql(s"CONVERT TO GRAFT graftlog.`$t2`")
    assert(spark.read.format("graftlog").load(t2).count() == 40L)
    // converting twice refuses (already a logged table)
    intercept[IllegalArgumentException](
      GraftSql.execute(spark, s"CONVERT TO GRAFT graftlog.`$t1`").collect())
  }
}
