package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The predicate-addressed rewrite pair:
  *
  *  - deleteWhere's FILE-DROP fast path — a file whose every visible
  *    row matches the predicate must be removed as pure metadata (no
  *    rewrite, no new file), proven from log-carried row counts and
  *    DV position counts alone; boundary stragglers still rewrite.
  *  - replaceWhere — the atomic predicate-scoped overwrite (Delta's
  *    replaceWhere): delete-matching + insert-new in ONE commit,
  *    incoming rows fenced in-plan to the replaced region, CDC
  *    delete pre-images + insert post-images, reachable through the
  *    DSv2 catalog (`writeTo(...).overwrite(cond)` and `INSERT INTO …
  *    REPLACE WHERE …`).
  *
  * Publisher-parameterized like the rest of the ACID suite. */
abstract class ReplaceWhereBehavior(publisher: AtomicPublisher) extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_rw").toString + "/t"

  private val schema = spark.range(0).toDF("id").schema

  private def ids(t: String): Set[Long] =
    CommitLog.read(spark, t, schema, Long.MaxValue).as[Long].collect().toSet

  private def dataFiles(t: String): Set[String] =
    CommitLog.liveFiles(spark, t)._2.toSet

  /** One single-file append per disjoint id range — the
    * cluster-aligned layout a retention delete meets at scale. */
  private def alignedTable(t: String, ranges: (Long, Long)*): Seq[Set[String]] = {
    ranges.map { case (lo, hi) =>
      val before = dataFiles(t)
      CommitLog.append(spark.range(lo, hi).toDF("id").repartition(1), t, publisher)
      dataFiles(t) -- before
    }
  }

  test("retention delete drops fully-matching files as metadata — no rewrite") {
    val t = freshTable()
    val Seq(f1, f2, f3) = alignedTable(t, (0L, 100L), (100L, 200L), (200L, 300L))
    assert((f1.size, f2.size, f3.size) == ((1, 1, 1)))
    val v = CommitLog.deleteWhere(spark, t, schema, col("id") < 200, publisher)
    assert(v == 4L)
    // both fully-matching files dropped; the survivor keeps its
    // identity; NOTHING was rewritten (no new file name exists)
    assert(dataFiles(t) == f3, "expected a pure-metadata drop of f1+f2")
    assert(ids(t) == (200L until 300L).toSet)
    // CDC still carries every deleted row (the dropped files' only read)
    val feed = CommitLog.changesSince(spark, t, sinceVersion = v - 1, schema)
    assert(feed.filter(col("_change_type") === "delete").count() == 200L)
  }

  test("boundary straggler rewrites; aligned files still drop") {
    val t = freshTable()
    val Seq(f1, f2, f3) = alignedTable(t, (0L, 100L), (100L, 200L), (200L, 300L))
    CommitLog.deleteWhere(spark, t, schema, col("id") < 150, publisher)
    val after = dataFiles(t)
    // f1 dropped, f2 replaced by exactly one fresh rewrite, f3 untouched
    assert(after.intersect(f1).isEmpty)
    assert(after.intersect(f2).isEmpty)
    assert(f3.subsetOf(after))
    assert((after -- f3).size == 1, s"expected one straggler rewrite, got $after")
    assert(ids(t) == (150L until 300L).toSet)
  }

  test("full-table delete is a pure-metadata truncate") {
    val t = freshTable()
    alignedTable(t, (0L, 100L), (100L, 200L))
    CommitLog.deleteWhere(spark, t, schema, lit(true), publisher)
    assert(dataFiles(t).isEmpty, "lit(true) delete must not land any file")
    assert(ids(t).isEmpty)
  }

  test("a DV-attached file drops when its remaining visible rows all match") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 100).toDF("id").repartition(1), t, publisher)
    CommitLog.deleteWhere(spark, t, schema, col("id") < 10, publisher,
      deletionVectors = true)
    // visible = 100 − 10 vectored; the predicate matches exactly those 90
    CommitLog.deleteWhere(spark, t, schema, col("id") >= 10, publisher)
    assert(dataFiles(t).isEmpty,
      "rows.count − DV count == matched must drop the file, not rewrite it")
    assert(ids(t).isEmpty)
  }

  test("replaceWhere re-lands a slice atomically: drop + insert in one commit") {
    val t = freshTable()
    val Seq(f1, f2, f3) = alignedTable(t, (0L, 100L), (100L, 200L), (200L, 300L))
    val v0 = CommitLog.liveFiles(spark, t)._1
    val fresh = spark.range(100L, 200L).toDF("id")
      .withColumn("id", col("id")) // corrected re-land of the same key range
    val v = CommitLog.replaceWhere(fresh, t,
      col("id") >= 100 && col("id") < 200, publisher)
    assert(v == v0 + 1, "replaceWhere must publish exactly one version")
    assert(ids(t) == (0L until 300L).toSet)
    val after = dataFiles(t)
    // untouched neighbors keep their identity; the replaced file is gone
    assert(f1.subsetOf(after) && f3.subsetOf(after))
    assert(after.intersect(f2).isEmpty)
    // CDC replays the replace exactly: 100 deletes + 100 inserts
    val feed = CommitLog.changesSince(spark, t, sinceVersion = v - 1, schema)
    assert(feed.filter(col("_change_type") === "delete").count() == 100L)
    assert(feed.filter(col("_change_type") === "insert").count() == 100L)
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet == (100L until 200L).toSet)
  }

  test("replaceWhere with no matching old rows is an atomic guarded insert") {
    val t = freshTable()
    alignedTable(t, (0L, 100L))
    val before = dataFiles(t)
    CommitLog.replaceWhere(spark.range(500L, 510L).toDF("id"), t,
      col("id") >= 500, publisher)
    assert(before.subsetOf(dataFiles(t)))
    assert(ids(t) == ((0L until 100L) ++ (500L until 510L)).toSet)
  }

  test("replaceWhere refuses input rows outside the predicate — loudly, pre-publish") {
    val t = freshTable()
    alignedTable(t, (0L, 100L))
    val v0 = CommitLog.liveFiles(spark, t)._1
    val e = intercept[Exception] {
      CommitLog.replaceWhere(spark.range(0L, 60L).toDF("id"), t,
        col("id") < 50, publisher) // rows 50..59 violate
    }
    assert(e.getMessage != null)
    assert(CommitLog.liveFiles(spark, t)._1 == v0,
      "a violating replace must not publish a version")
    assert(ids(t) == (0L until 100L).toSet)
  }

  test("replaceWhere with a NULL-valued predicate treats NULL as outside") {
    val t = freshTable()
    CommitLog.append(Seq((1L, "a"), (2L, null), (3L, "b")).toDF("id", "v"),
      t, publisher)
    val sch = Seq((1L, "a")).toDF("id", "v").schema
    // delete side: v = 'a' is NULL for row 2 → row 2 stays
    CommitLog.replaceWhere(Seq((10L, "a")).toDF("id", "v"), t,
      col("v") === "a", publisher)
    val left = CommitLog.read(spark, t, sch, Long.MaxValue)
      .select("id").as[Long].collect().toSet
    assert(left == Set(2L, 3L, 10L))
    // insert side: a NULL predicate value on an incoming row refuses
    intercept[Exception] {
      CommitLog.replaceWhere(Seq((11L, null: String)).toDF("id", "v"), t,
        col("v") === "a", publisher)
    }
  }

  test("file-drop classification: stats + DV counts decide, absence abstains") {
    def entry(rc: Option[Long], dv: Option[String], dvRows: Option[Long]) =
      CommitLog.LiveEntry("f1",
        rc.map(n => s"""{"rows.count":[$n,$n],"bytes.size":[100,100]}"""),
        dv, dvRows)
    def drops(e: CommitLog.LiveEntry, matched: Long): Boolean =
      CommitLog.partialMatches(Seq(e), Map("f1" -> matched)).isEmpty
    assert(drops(entry(Some(10L), None, None), 10L), "full match must drop")
    assert(!drops(entry(Some(10L), None, None), 9L), "partial match must rewrite")
    assert(!drops(entry(None, None, None), 10L), "missing stats must abstain")
    assert(drops(entry(Some(10L), Some("dv"), Some(4L)), 6L),
      "rc − dvRows == matched must drop")
    assert(!drops(entry(Some(10L), Some("dv"), Some(4L)), 10L),
      "matched beyond visible must rewrite (never drop on a stale count)")
    assert(!drops(entry(Some(10L), Some("dv"), None), 10L),
      "a countless DV attachment must abstain")
  }

  test("a keyed merge covering a whole aligned file drops it; neighbors untouched") {
    val t = freshTable()
    val mk = (lo: Long, hi: Long, v: String) =>
      spark.range(lo, hi).toDF("id").withColumn("v", lit(v)).repartition(1)
    CommitLog.append(mk(0L, 100L, "old"), t, publisher)
    val fA = dataFiles(t)
    CommitLog.append(mk(100L, 200L, "keep"), t, publisher)
    val fB = dataFiles(t) -- fA
    val sch = mk(0L, 1L, "x").schema
    CommitLog.merge(spark, t, sch, mk(0L, 100L, "new"), Seq("id"), publisher)
    val after = dataFiles(t)
    assert(after.intersect(fA).isEmpty, "the fully-covered file must go")
    assert(fB.subsetOf(after), "the untouched neighbor must keep its identity")
    val rows = CommitLog.read(spark, t, sch).as[(Long, String)].collect().toMap
    assert(rows.size == 200)
    assert((0L until 100L).forall(rows(_) == "new"))
    assert((100L until 200L).forall(rows(_) == "keep"))
  }

  test("replaceWhereOnce: exactly-once across crash replay") {
    val t = freshTable()
    alignedTable(t, (0L, 100L), (100L, 200L))
    val won = CommitLog.replaceWhereOnce(spark.range(100L, 150L).toDF("id"), t,
      col("id") >= 100 && col("id") < 200, "rwq", batchId = 1L, publisher)
    assert(won.isDefined)
    assert(ids(t) == ((0L until 100L) ++ (100L until 150L)).toSet)
    val v1 = CommitLog.liveFiles(spark, t)._1
    // crash replay of the same batch: no commit, no double-delete/insert
    assert(CommitLog.replaceWhereOnce(spark.range(100L, 150L).toDF("id"), t,
      col("id") >= 100 && col("id") < 200, "rwq", batchId = 1L, publisher).isEmpty)
    assert(CommitLog.liveFiles(spark, t)._1 == v1)
    assert(ids(t) == ((0L until 100L) ++ (100L until 150L)).toSet)
    // the next batch applies; an empty batch over a matching slice
    // truncates it (meaningful) and claims its id
    assert(CommitLog.replaceWhereOnce(
      spark.range(0L, 0L).toDF("id"), t, col("id") < 100, "rwq",
      batchId = 2L, publisher).isDefined)
    assert(ids(t) == (100L until 150L).toSet)
    assert(CommitLog.replaceWhereOnce(
      spark.range(0L, 0L).toDF("id"), t, col("id") < 100, "rwq",
      batchId = 2L, publisher).isEmpty)
  }

  test("nondeterministic predicates are refused: probe and rewrite would select different rows") {
    val t = freshTable()
    alignedTable(t, (0L, 10L))
    val before = CommitLog.latestVersion(spark, t)
    // deleteWhere evaluates the predicate in two jobs (match-count
    // probe, straggler rewrite); rand() selects a different row set in
    // each — the verb must refuse, not silently half-delete
    val ex = intercept[IllegalArgumentException] {
      CommitLog.deleteWhere(spark, t, schema, rand() < 0.5, publisher)
    }
    assert(ex.getMessage.contains("deterministic"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      CommitLog.replaceWhere(spark.range(0, 3).toDF("id"), t,
        rand() < 0.5, publisher)
    }
    assert(ex2.getMessage.contains("deterministic"), ex2.getMessage)
    // the SQL spelling arrives as an unresolved function call — the
    // analyzed-condition check must catch it too
    val ex3 = intercept[Exception] {
      CommitLog.deleteWhere(spark, t, schema, expr("rand() < 0.5"), publisher)
    }
    assert(ex3.getMessage.contains("deterministic"), ex3.getMessage)
    // updateWhere evaluates the predicate up to FOUR times (probe,
    // when(hit) rewrite, two CDC image filters) — same refusal
    val ex4 = intercept[IllegalArgumentException] {
      CommitLog.updateWhere(spark, t, schema, rand() < 0.5,
        Map("id" -> (col("id") + 100L)), publisher)
    }
    assert(ex4.getMessage.contains("deterministic"), ex4.getMessage)
    // ...and a nondeterministic SET assignment (evaluated once for the
    // data write, again for the CDC post-images) refuses likewise
    val ex5 = intercept[IllegalArgumentException] {
      CommitLog.updateWhere(spark, t, schema, col("id") === 1L,
        Map("id" -> (rand() * 100).cast("long")), publisher)
    }
    assert(ex5.getMessage.contains("deterministic"), ex5.getMessage)
    assert(CommitLog.latestVersion(spark, t) == before,
      "a refused nondeterministic verb must not commit")
    assert(ids(t) == (0L until 10L).toSet)
  }

  test("the determinism fence accepts non-orderable (map-typed) deterministic assignments") {
    val t = freshTable()
    val df = spark.range(0, 3).toDF("id")
      .withColumn("m", map(lit("k"), col("id")))
    CommitLog.append(df, t, publisher)
    // a map-valued SET is deterministic but has no ordering — the fence
    // must analyze it through a projection, not a comparison
    CommitLog.updateWhere(spark, t, df.schema, col("id") === 1L,
      Map("m" -> map(lit("k"), lit(99L))), publisher)
    val got = CommitLog.read(spark, t, df.schema)
      .filter(col("id") === 1L)
      .select(element_at(col("m"), "k")).as[Long].head()
    assert(got == 99L)
  }

  test("replaceWhere refuses a shape change when a ledger exists") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 10).toDF("id"), t, publisher,
      mergeSchema = true) // stamps the schema ledger
    val e = intercept[IllegalArgumentException] {
      CommitLog.replaceWhere(spark.range(0, 5).toDF("id")
        .withColumn("extra", lit(1)), t, col("id") < 5, publisher)
    }
    assert(e.getMessage.contains("shape"))
  }
}

/** HDFS/local semantics: exclusive rename / hard link. */
class ReplaceWhereSpec extends ReplaceWhereBehavior(RenameOrLinkPublisher)

/** S3-class semantics: conditional PUT over the local emulation. */
class ReplaceWhereS3Spec extends ReplaceWhereBehavior(
  new ConditionalPutPublisher(new LocalConditionalPutStore))

/** Catalog-surface spellings of replaceWhere — one publisher is enough
  * (the catalog always publishes through the default). */
class ReplaceWhereCatalogSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.graft.warehouse",
      Files.createTempDirectory("graft_rw_wh").toString)
  }

  test("writeTo(...).overwrite(cond) routes to replaceWhere") {
    spark.sql("DROP TABLE IF EXISTS graft.rw1")
    spark.sql("CREATE TABLE graft.rw1 (id BIGINT, part STRING)")
    spark.sql("INSERT INTO graft.rw1 SELECT id, 'a' FROM range(10)")
    spark.sql("INSERT INTO graft.rw1 SELECT id + 100, 'b' FROM range(10)")
    Seq.range(200L, 205L).map(id => (id, "b")).toDF("id", "part")
      .writeTo("graft.rw1").overwrite(col("part") === "b")
    val rows = spark.sql("SELECT id, part FROM graft.rw1").as[(Long, String)]
      .collect().toSet
    assert(rows == ((0L until 10L).map(_ -> "a") ++
      (200L until 205L).map(_ -> "b")).toSet)
    // the 'a' slice was untouched, not rewritten: still served and the
    // replace itself committed exactly one version with CDC rows
    spark.sql("DROP TABLE graft.rw1")
  }

  test("INSERT INTO … REPLACE WHERE … in plain SQL") {
    spark.sql("DROP TABLE IF EXISTS graft.rw2")
    spark.sql("CREATE TABLE graft.rw2 (id BIGINT, day STRING)")
    spark.sql("INSERT INTO graft.rw2 VALUES (1, 'd1'), (2, 'd1'), (3, 'd2')")
    spark.sql(
      "INSERT INTO graft.rw2 REPLACE WHERE day = 'd1' VALUES (10, 'd1'), (11, 'd1')")
    val rows = spark.sql("SELECT id, day FROM graft.rw2").as[(Long, String)]
      .collect().toSet
    assert(rows == Set((10L, "d1"), (11L, "d1"), (3L, "d2")))
    // violating inserts refuse through the SQL path too
    intercept[Exception] {
      spark.sql("INSERT INTO graft.rw2 REPLACE WHERE day = 'd1' VALUES (9, 'd9')")
    }
    assert(spark.sql("SELECT count(*) FROM graft.rw2").as[Long].head() == 3L)
    spark.sql("DROP TABLE graft.rw2")
  }
}
