package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Writer-side clustering behind the `graft.clusterBy` table property
  * ([[CommitLog.clusteredForWrite]]): appended batches land range- or
  * Z-order-clustered, so log-stats pruning bites on fresh data without
  * a scheduled OPTIMIZE; a bad spec fails the write loudly; an empty
  * batch and a property-free table are untouched. */
class ClusteredWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val p = s"/tmp/graft_test/cluster_write_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }

  /** Per-live-file (min, max) log-stats bounds of a long column. */
  private def bounds(t: String, c: String): Seq[(Long, Long)] = {
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, t)
    withStats.map { case (n, js) =>
      val b = CommitLog.parseStatsJson(js.getOrElse(fail(s"no stats on $n")))(c)
      (b._1.asInstanceOf[Long], b._2.asInstanceOf[Long])
    }
  }

  test("range clusterBy: appended batch lands as disjoint per-file ranges") {
    val t = freshDir("range")
    // property first (empty table), then one wide shuffled batch
    CommitLog.setProperties(spark, t,
      Map("graft.clusterBy" -> "id", "graft.clusterBy.files" -> "4"))
    val batch = spark.range(0, 400).select(col("id"))
      .withColumn("r", pmod(col("id") * 2654435761L, lit(97)))
      .repartition(8, col("r")).drop("r") // scrambled input partitioning
    batch.write.format("graftlog").mode("append").save(t)
    val b = bounds(t, "id")
    assert(b.size == 4, s"expected graft.clusterBy.files=4 files, got $b")
    // clustered: ranges are pairwise disjoint (so any id predicate
    // prunes to one file from the log alone) and cover all rows
    val sorted = b.sortBy(_._1)
    assert(sorted.sliding(2).forall {
      case Seq((_, aMax), (bMin, _)) => aMax < bMin
      case _ => true
    }, s"file ranges overlap: $sorted")
    assert(spark.read.format("graftlog").load(t).count() == 400)
    assert(spark.read.format("graftlog").load(t)
      .where(col("id") === 137L).count() == 1)
  }

  test("multi-column clusterBy Z-orders: both columns' per-file ranges narrow") {
    val t = freshDir("zorder")
    CommitLog.setProperties(spark, t,
      Map("graft.clusterBy" -> "x,y", "graft.clusterBy.files" -> "4"))
    val grid = (0L until 32L).flatMap(x => (0L until 32L).map(y => (x, y)))
    grid.toDF("x", "y").repartition(8).write
      .format("graftlog").mode("append").save(t)
    val bx = bounds(t, "x"); val by = bounds(t, "y")
    assert(bx.size == 4)
    // Z-order promise: files cover hyper-rectangles, so BOTH columns
    // prune — some file must exclude each edge of each dimension
    // (plain single-column range clustering would leave the other
    // column's per-file range at full width in every file)
    assert(bx.exists(_._2 < 31) && bx.exists(_._1 > 0), s"x never narrows: $bx")
    assert(by.exists(_._2 < 31) && by.exists(_._1 > 0), s"y never narrows: $by")
    assert(spark.read.format("graftlog").load(t).count() == 32 * 32)
  }

  test("a bad spec fails the append loudly; empty batches and plain tables are untouched") {
    val t = freshDir("bad")
    CommitLog.setProperties(spark, t, Map("graft.clusterBy" -> "zzz"))
    val before = CommitLog.latestVersion(spark, t)
    val ex = intercept[IllegalArgumentException] {
      Seq((1L, "a")).toDF("id", "s").write
        .format("graftlog").mode("append").save(t)
    }
    assert(ex.getMessage.contains("zzz"))
    assert(CommitLog.latestVersion(spark, t) == before,
      "a refused clustered append must not commit")
    // empty batch: no range to cluster on — append succeeds (no-op)
    CommitLog.setProperties(spark, t, Map("graft.clusterBy" -> "id"))
    Seq.empty[(Long, String)].toDF("id", "s").write
      .format("graftlog").mode("append").save(t)
    // property-free table: writes land exactly as the caller shaped them
    val plain = freshDir("plain")
    spark.range(0, 100).toDF("id").repartition(3)
      .write.format("graftlog").mode("append").save(plain)
    assert(CommitLog.liveFiles(spark, plain)._2.size == 3)
  }

  test("overwrite honors clusterBy: the replacement lands clustered") {
    val t = freshDir("ow")
    CommitLog.setProperties(spark, t,
      Map("graft.clusterBy" -> "id", "graft.clusterBy.files" -> "3"))
    spark.range(0, 30).toDF("id").write
      .format("graftlog").mode("append").save(t)
    spark.range(0, 300).toDF("id").repartition(8)
      .write.format("graftlog").mode("overwrite").save(t)
    val b = bounds(t, "id").sortBy(_._1)
    assert(b.size == 3, s"expected 3 files, got $b")
    assert(b.sliding(2).forall {
      case Seq((_, aMax), (bMin, _)) => aMax < bMin
      case _ => true
    }, s"overwrite files overlap: $b")
    assert(spark.read.format("graftlog").load(t).count() == 300)
  }
}

/** `CLUSTER BY` through the catalog — the liquid-clustering SQL
  * spelling of graft.clusterBy: CREATE TABLE … CLUSTER BY declares it,
  * ALTER TABLE … CLUSTER BY re-points it, CLUSTER BY NONE drops it
  * (no-op on an unclustered table), DESCRIBE reports it, and a
  * PARTITIONED BY spelling keeps the loud flat-layout refusal. */
class CatalogClusterBySpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.graft.warehouse",
      java.nio.file.Files.createTempDirectory("graft_cb_wh").toString)
  }

  test("CREATE TABLE … CLUSTER BY lands writes clustered; ALTER re-points it") {
    spark.sql("DROP TABLE IF EXISTS graft.cb")
    spark.sql("CREATE TABLE graft.cb (id BIGINT, v BIGINT) CLUSTER BY (id) " +
      "TBLPROPERTIES ('graft.clusterBy.files' = '4')")
    val path = spark.conf.get("spark.graft.warehouse") + "/cb"
    assert(CommitLog.propertiesAt(spark, path).get("graft.clusterBy")
      .contains("id"))
    // a scrambled insert lands as disjoint per-file id ranges
    spark.range(0, 400)
      .select(col("id"), pmod(col("id") * 2654435761L, lit(97)).as("v"))
      .repartition(8, col("v"))
      .writeTo("graft.cb").append()
    val (_, withStats) = CommitLog.liveFilesWithStats(spark, path)
    val b = withStats.map { case (n, js) =>
      val s = CommitLog.parseStatsJson(js.get)("id")
      (s._1.asInstanceOf[Long], s._2.asInstanceOf[Long])
    }.sortBy(_._1)
    assert(b.size == 4, s"expected 4 clustered files, got $b")
    b.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping file ranges: $b")
    case _ => ()
    }
    // DESCRIBE surfaces the clustering (partitioning() reports it)
    val desc = spark.sql("DESCRIBE TABLE graft.cb").collect().map(_.toString).mkString
    assert(desc.contains("id"), desc)
    // ALTER re-points; CLUSTER BY NONE drops; both visible in properties
    spark.sql("ALTER TABLE graft.cb CLUSTER BY (v, id)")
    assert(CommitLog.propertiesAt(spark, path)("graft.clusterBy") == "v,id")
    spark.sql("ALTER TABLE graft.cb CLUSTER BY NONE")
    assert(!CommitLog.propertiesAt(spark, path).contains("graft.clusterBy"))
    // NONE on an already-unclustered table is a no-op, not a loud unset
    spark.sql("ALTER TABLE graft.cb CLUSTER BY NONE")
    spark.sql("DROP TABLE graft.cb")
  }

  test("DDL validates clustering columns; rename/drop of a clustered column refused") {
    spark.sql("DROP TABLE IF EXISTS graft.cbg")
    // a typo'd CLUSTER BY refuses at CREATE, not at the first INSERT
    // (Spark's own analyzer catches the transform spelling; the
    // catalog's check covers the TBLPROPERTIES spelling below)
    val e0 = intercept[Exception](
      spark.sql("CREATE TABLE graft.cbg (id BIGINT) CLUSTER BY (idd)"))
    assert(e0.getMessage.contains("idd"), e0.getMessage)
    val e0b = intercept[Exception](
      spark.sql("CREATE TABLE graft.cbg (id BIGINT) " +
        "TBLPROPERTIES ('graft.clusterBy' = 'idd')"))
    assert(e0b.getMessage.contains("not columns"), e0b.getMessage)
    spark.sql("CREATE TABLE graft.cbg (id BIGINT, v BIGINT) CLUSTER BY (id)")
    // renaming/dropping the clustered column would brick every write —
    // refused up front, like a bloom-indexed column
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE graft.cbg RENAME COLUMN id TO k"))
    assert(e1.getMessage.contains("clusterBy"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE graft.cbg DROP COLUMN id"))
    assert(e2.getMessage.contains("clusterBy"), e2.getMessage)
    // re-pointing to a nonexistent column refuses too
    val e3 = intercept[Exception](
      spark.sql("ALTER TABLE graft.cbg CLUSTER BY (nope)"))
    assert(e3.getMessage.contains("not columns"), e3.getMessage)
    // after CLUSTER BY NONE the rename proceeds
    spark.sql("ALTER TABLE graft.cbg CLUSTER BY NONE")
    spark.sql("ALTER TABLE graft.cbg RENAME COLUMN id TO k")
    spark.sql("DROP TABLE graft.cbg")
  }

  test("graft.clusterBy.files validates at SET time: non-numeric and non-positive refused") {
    val t = "/tmp/graft_test/cluster_files_validate"
    val hp = new org.apache.hadoop.fs.Path(t)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    // a malformed value must fail the SET that introduces it — accepted,
    // it would NumberFormatException every subsequent write instead
    for (bad <- Seq("abc", "0", "-3", "1.5")) {
      val ex = intercept[IllegalArgumentException] {
        CommitLog.setProperties(spark, t, Map("graft.clusterBy.files" -> bad))
      }
      assert(ex.getMessage.contains("clusterBy.files"), ex.getMessage)
    }
    assert(CommitLog.latestVersion(spark, t) == 0,
      "a refused property set must not commit")
    // a valid value lands and drives the write-site file count
    CommitLog.setProperties(spark, t,
      Map("graft.clusterBy" -> "id", "graft.clusterBy.files" -> "2"))
    spark.range(0, 100).toDF("id")
      .write.format("graftlog").mode("append").save(t)
    assert(CommitLog.liveFiles(spark, t)._2.size == 2)
  }

  test("PARTITIONED BY keeps the loud refusal; double clustering declaration refused") {
    spark.sql("DROP TABLE IF EXISTS graft.cbbad")
    val e = intercept[Exception](
      spark.sql("CREATE TABLE graft.cbbad (id BIGINT, d STRING) PARTITIONED BY (d)"))
    assert(e.getMessage.contains("CLUSTER BY") || e.getMessage.contains("partition"))
    val e2 = intercept[Exception](
      spark.sql("CREATE TABLE graft.cbbad (id BIGINT) CLUSTER BY (id) " +
        "TBLPROPERTIES ('graft.clusterBy' = 'id')"))
    assert(e2.getMessage.contains("once"))
  }
}
