package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** RESTORE TABLE … TO VERSION AS OF — the rollback verb: one commit,
  * zero data movement (historical files re-used byte-identical),
  * deletion-vector and schema state restored with them, pre-restore
  * history still reachable, vacuumed targets refused loudly. */
abstract class RestoreBehavior(publisher: AtomicPublisher) extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_restore").toString + "/t"

  private val schema = spark.range(0).toDF("id").schema

  private def ids(t: String, asOf: Long = Long.MaxValue): Set[Long] =
    CommitLog.read(spark, t, schema, asOf).as[Long].collect().toSet

  test("restore rewinds live state with zero data movement") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 100).toDF("id"), t, publisher)            // v1
    CommitLog.append(spark.range(100, 200).toDF("id"), t, publisher)          // v2
    val v2Files = CommitLog.liveFiles(spark, t)._2.toSet
    CommitLog.deleteWhere(spark, t, schema, col("id") < 50, publisher)        // v3 (COW)
    CommitLog.append(spark.range(500, 510).toDF("id"), t, publisher)          // v4
    val v = CommitLog.restore(spark, t, toVersion = 2, publisher)
    assert(v == 5L)
    assert(ids(t) == (0L until 200L).toSet, "restore content wrong")
    // the restored live set IS v2's file set — nothing was rewritten
    assert(CommitLog.liveFiles(spark, t)._2.toSet == v2Files)
    // pre-restore history is still reachable
    assert(ids(t, asOf = 4) == ((50L until 200L) ++ (500L until 510L)).toSet)
    // history shows the restore
    assert(CommitLog.history(spark, t).filter(col("operation") === "restore")
      .count() == 1)
    // restoring to the current version is a proven no-op
    assert(CommitLog.restore(spark, t, toVersion = 5) == 5L)
  }

  test("governance state (constraints, properties) survives a restore") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 10).toDF("id"), t, publisher)             // v1
    CommitLog.append(spark.range(10, 20).toDF("id"), t, publisher)            // v2
    CommitLog.addConstraint(spark, t, "id_nonneg", "id >= 0", publisher)      // v3
    CommitLog.setProperties(spark, t, Map("bloom.columns" -> "id"), publisher) // v4
    // rewind DATA to v1 — the constraint and property added later
    // must still be active (a rollback is not a governance bypass)
    CommitLog.restore(spark, t, toVersion = 1, publisher)
    assert(ids(t) == (0L until 10L).toSet)
    assert(CommitLog.constraintsAt(spark, t) == Map("id_nonneg" -> "id >= 0"))
    assert(CommitLog.propertiesAt(spark, t) == Map("bloom.columns" -> "id"))
    val e = intercept[Exception] {
      CommitLog.append(Seq(-1L).toDF("id"), t)
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("CHECK constraint")))
  }

  test("restore rewinds deletion-vector state in both directions") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 100).toDF("id").coalesce(1), t, publisher) // v1
    CommitLog.deleteWhere(spark, t, schema, col("id") < 10, publisher,
      deletionVectors = true)                                       // v2: vectored
    CommitLog.deleteWhere(spark, t, schema, col("id") < 20, publisher,
      deletionVectors = true)                                       // v3: re-vectored
    // rewind to the SMALLER vector: kept file re-attaches v2's vector
    CommitLog.restore(spark, t, toVersion = 2, publisher)
    assert(ids(t) == (10L until 100L).toSet)
    // rewind to the vector-FREE state: the detach marker clears it
    CommitLog.restore(spark, t, toVersion = 1, publisher)
    assert(ids(t) == (0L until 100L).toSet)
    assert(CommitLog.liveFilesFull(spark, t)._2.forall(_.dv.isEmpty))
    // forward again to the vectored state (files re-added + attach)
    CommitLog.restore(spark, t, toVersion = 3, publisher)
    assert(ids(t) == (20L until 100L).toSet)
  }

  test("restore to a vacuumed snapshot is refused loudly; SQL verb works") {
    val t = freshTable()
    CommitLog.append(spark.range(0, 50).toDF("id"), t, publisher)              // v1
    CommitLog.compact(spark, t, targetBytes = Long.MaxValue, publisher = publisher)        // v2
    CommitLog.vacuum(spark, t, minAgeMs = 0) // v1's files reclaimed
    val e = intercept[IllegalStateException] {
      CommitLog.restore(spark, t, toVersion = 1)
    }
    assert(e.getMessage.contains("vacuumed"))
    intercept[IllegalArgumentException] {
      CommitLog.restore(spark, t, toVersion = 99)
    }
    // SQL: one more version, then rewind it by statement
    CommitLog.append(spark.range(100, 110).toDF("id"), t, publisher)           // v3
    val out = GraftSql.execute(spark,
      s"RESTORE TABLE graftlog.`$t` TO VERSION AS OF 2")
    assert(out.columns.toSeq == Seq("table", "committed_version"))
    assert(ids(t) == (0L until 50L).toSet)
  }
}

/** HDFS/local semantics: exclusive rename / hard link. */
class RestoreSpec extends RestoreBehavior(RenameOrLinkPublisher)

/** S3-class semantics: conditional PUT over the local emulation. */
class RestoreS3Spec extends RestoreBehavior(
  new ConditionalPutPublisher(new LocalConditionalPutStore))
