package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Metadata-only COUNT/MIN/MAX over logged tables
  * ([[GraftStatsAggRule]]): the values must equal the scan's, the
  * optimized plan must be scan-free when the rewrite fires, and every
  * abstention case must keep a correct (scanning) plan. */
class StatsAggSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"/tmp/graft_test/stats_agg_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  private def scans(df: DataFrame): Seq[LogicalRelation] =
    df.queryExecution.optimizedPlan.collect { case lr: LogicalRelation => lr }

  private def isMetadataOnly(df: DataFrame): Boolean =
    scans(df).isEmpty &&
      df.queryExecution.optimizedPlan.exists(_.isInstanceOf[LocalRelation])

  test("unfiltered count/min/max fold to a LocalRelation, values scan-exact") {
    import spark.implicits._
    val t = freshDir("basic")
    // two commits → two file generations, both carrying stats
    (1L to 500L).map(i => (i, i * 2.5, i.toInt % 97)).toDF("id", "x", "k")
      .write.format("graftlog").mode("append").save(t)
    (501L to 800L).map(i => (i, -i * 1.5, i.toInt % 89)).toDF("id", "x", "k")
      .write.format("graftlog").mode("append").save(t)

    val agg = spark.read.format("graftlog").load(t)
      .agg(count(lit(1)).as("n"), min("id").as("min_id"), max("id").as("max_id"),
        min("x").as("min_x"), max("x").as("max_x"), max("k").as("max_k"))
    assert(isMetadataOnly(agg), s"expected metadata-only plan:\n${agg.queryExecution.optimizedPlan}")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 800L)
    assert(r.getLong(1) == 1L && r.getLong(2) == 800L)
    assert(r.getDouble(3) == -1200.0 && r.getDouble(4) == 1250.0)
    assert(r.getInt(5) == 96)
  }

  test("a filter or a string extreme keeps the scanning plan; COUNT(col) folds") {
    import spark.implicits._
    val t = freshDir("abstain")
    Seq((1L, "alpha"), (2L, null: String), (3L, "mid")).toDF("id", "s")
      .write.format("graftlog").mode("append").save(t)
    val base = spark.read.format("graftlog").load(t)

    val filtered = base.where(col("id") > 1).agg(count(lit(1)).as("n"))
    assert(!isMetadataOnly(filtered), "a filtered COUNT must scan")
    assert(filtered.collect()(0).getLong(0) == 2L)

    // COUNT(col) folds from rows.count − the log-carried `s.nulls`
    val colCount = base.agg(count(col("s")).as("n"))
    assert(isMetadataOnly(colCount),
      s"plan:\n${colCount.queryExecution.optimizedPlan}")
    assert(colCount.collect()(0).getLong(0) == 2L)

    val strMin = base.agg(min("s").as("m")) // bounds are envelopes
    assert(!isMetadataOnly(strMin))
    assert(strMin.collect()(0).getString(0) == "alpha")
  }

  test("merge-on-read COUNT answers from log-carried vector counts; extremes scan") {
    import spark.implicits._
    val t = freshDir("dv")
    (1L to 100L).toDF("id").write.format("graftlog").mode("append").save(t)
    CommitLog.deleteWhere(spark, t, CommitLog.tableSchema(spark, t),
      col("id") % 10 === 0, deletionVectors = true)
    // COUNT = Σ rows.count − Σ `*file|dvfile|n` position counts — no
    // data OR vector file opened
    val agg = spark.read.format("graftlog").load(t).agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(agg), s"plan:\n${agg.queryExecution.optimizedPlan}")
    assert(agg.collect()(0).getLong(0) == 90L)
    // a second MOR delete REPLACES the vector (cumulative): the count
    // must track the replacement, not double-subtract
    CommitLog.deleteWhere(spark, t, CommitLog.tableSchema(spark, t),
      col("id") <= 5, deletionVectors = true)
    val agg2 = spark.read.format("graftlog").load(t).agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(agg2))
    assert(agg2.collect()(0).getLong(0) == 85L)
    // a vectored row may hold the extreme — MIN/MAX must scan
    val ext = spark.read.format("graftlog").load(t)
      .agg(min("id").as("lo"), max("id").as("hi"))
    assert(!isMetadataOnly(ext))
    val r = ext.collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 99L)
  }

  test("MOR counts survive clone and restore; a column-mapped table still folds") {
    import spark.implicits._
    val t = freshDir("dv_carry"); val c = freshDir("dv_carry_clone")
    (1L to 100L).toDF("id").write.format("graftlog").mode("append").save(t)
    CommitLog.deleteWhere(spark, t, CommitLog.tableSchema(spark, t),
      col("id") % 4 === 0, deletionVectors = true) // v2: 75 visible
    // clone carries the attachment AND its count
    CommitLog.shallowClone(spark, t, c)
    val cloneAgg = spark.read.format("graftlog").load(c).agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(cloneAgg), s"plan:\n${cloneAgg.queryExecution.optimizedPlan}")
    assert(cloneAgg.collect()(0).getLong(0) == 75L)
    // restore to the vector-free version and back: counts re-attach
    CommitLog.restore(spark, t, 1L)
    CommitLog.restore(spark, t, 2L)
    val restored = spark.read.format("graftlog").load(t).agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(restored))
    assert(restored.collect()(0).getLong(0) == 75L)
    // column-mapped (renamed), vector-free table: the DV-relation path
    // still answers COUNT and remapped MIN/MAX metadata-only
    val m = freshDir("mapped")
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "s")
      .write.format("graftlog").mode("append").save(m)
    CommitLog.renameColumn(spark, m, "id", "key")
    val mapped = spark.read.format("graftlog").load(m)
      .agg(count(lit(1)).as("n"), min("key").as("lo"), max("key").as("hi"))
    assert(isMetadataOnly(mapped), s"plan:\n${mapped.queryExecution.optimizedPlan}")
    val mr = mapped.collect()(0)
    assert(mr.getLong(0) == 50L && mr.getLong(1) == 1L && mr.getLong(2) == 50L)
  }

  test("vector counts survive checkpoint + pruneLog (checkpoint-carried, not commit-bound)") {
    import spark.implicits._
    val t = freshDir("ckpt")
    // nine appends then a MOR delete → version 10 writes a checkpoint
    (1 to 9).foreach(k => (k * 100L until k * 100L + 100L).toDF("id")
      .write.format("graftlog").mode("append").save(t))
    CommitLog.deleteWhere(spark, t, CommitLog.tableSchema(spark, t),
      col("id") % 9 === 0, deletionVectors = true)
    assert(CommitLog.latestVersion(spark, t) == 10L)
    val expect = (1 to 9).flatMap(k => k * 100L until k * 100L + 100L)
      .count(_ % 9 != 0).toLong
    // prune the commit files the checkpoint subsumes: replay now reads
    // ONLY the checkpoint, so the `*file|dv|n` counts must ride it
    CommitLog.pruneLog(spark, t)
    val agg = spark.read.format("graftlog").load(t).agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(agg), s"plan:\n${agg.queryExecution.optimizedPlan}")
    assert(agg.collect()(0).getLong(0) == expect)
  }

  test("empty table answers count 0 and null extremes from metadata") {
    import spark.implicits._
    val t = freshDir("empty")
    // a schema ledger with zero data files: create-then-delete-all
    (1L to 5L).toDF("id").write.format("graftlog").mode("append").save(t)
    CommitLog.deleteWhere(spark, t, CommitLog.tableSchema(spark, t), lit(true))
    val agg = spark.read.format("graftlog").load(t)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    assert(isMetadataOnly(agg), s"plan:\n${agg.queryExecution.optimizedPlan}")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("catalog SQL count(*) answers from the log; the off-switch restores the scan") {
    val t = "stats_agg_sql"
    spark.conf.set("spark.graft.warehouse", freshDir("warehouse"))
    spark.sql(s"DROP TABLE IF EXISTS graft.$t")
    spark.sql(s"CREATE TABLE graft.$t (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO graft.$t SELECT id, id * 1.5 FROM range(1000)")
    val agg = spark.sql(
      s"SELECT count(*) AS n, min(id) AS lo, max(id) AS hi FROM graft.$t")
    assert(isMetadataOnly(agg), s"plan:\n${agg.queryExecution.optimizedPlan}")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 1000L && r.getLong(1) == 0L && r.getLong(2) == 999L)
    try {
      spark.conf.set("spark.graft.statsAggregation", "false")
      val off = spark.sql(s"SELECT count(*) AS n FROM graft.$t")
      assert(!isMetadataOnly(off), "off-switch must restore the scan")
      assert(off.collect()(0).getLong(0) == 1000L)
    } finally spark.conf.unset("spark.graft.statsAggregation")
    spark.sql(s"DROP TABLE graft.$t")
  }

  test("a dotted column name abstains — never folds the reserved stats keys") {
    import spark.implicits._
    val t = freshDir("dotted")
    // a numeric column literally named `rows.count` (legal via
    // backticks) shares the stats-key namespace with the reserved
    // per-file row-count entry; the emitter never records bounds for
    // dotted names, so the only entry under that key IS the row count
    // — MIN/MAX must take the scan path, not fold 3 (the file's rows)
    Seq(500L, 900L, 1300L).toDF("rows.count")
      .write.format("graftlog").mode("append").save(t)
    val base = spark.read.format("graftlog").load(t)
    val ext = base.agg(min(col("`rows.count`")).as("lo"),
      max(col("`rows.count`")).as("hi"))
    assert(!isMetadataOnly(ext),
      s"dotted-name MIN/MAX must scan:\n${ext.queryExecution.optimizedPlan}")
    val r = ext.collect()(0)
    assert(r.getLong(0) == 500L && r.getLong(1) == 1300L)
    // COUNT(*) keys on the reserved entry itself — still metadata-only
    val cnt = base.agg(count(lit(1)).as("n"))
    assert(isMetadataOnly(cnt))
    assert(cnt.collect()(0).getLong(0) == 3L)
  }

  test("a ±0.0 double bound abstains (parquet zero-sign normalization)") {
    import spark.implicits._
    val t = freshDir("zero")
    Seq(0.0, 1.5, 7.25).toDF("x").write.format("graftlog").mode("append").save(t)
    val agg = spark.read.format("graftlog").load(t)
      .agg(min("x").as("lo"), max("x").as("hi"))
    // min bound is a zero whose sign the footer may have normalized —
    // the rewrite must not serve it; the scan answer stays correct
    assert(!isMetadataOnly(agg))
    val r = agg.collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 7.25)
  }
}
