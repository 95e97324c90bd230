package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The logged-table streaming source (CdcStream.drain): bounded
  * micro-batches over the change feed, exactly-once landing in a
  * downstream logged table, crash-mid-drain replay, and source-DELETE
  * crossing — under both publishers. */
abstract class CdcStreamBehavior(publisher: AtomicPublisher) extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_cdc_$tag").toString + "/t"

  private val schema = Seq((0L, "v")).toDF("id", "v").schema

  /** keep non-multiples-of-3, derive a length column; carries `id`
    * through unchanged (the keyed contract). */
  private def transform(df: DataFrame): DataFrame =
    df.filter(col("id") % 3 =!= 0)
      .select(col("id"), col("v"), length(col("v")).as("w"))

  private def sinkRows(t: String): Set[(Long, String, Int)] =
    CommitLog.read(spark, t,
      Seq((0L, "v", 0)).toDF("id", "v", "w").schema)
      .as[(Long, String, Int)].collect().toSet

  private def expected(src: String): Set[(Long, String, Int)] =
    transform(CommitLog.read(spark, src, schema))
      .as[(Long, String, Int)].collect().toSet

  /** v1: 0..99 "a"; v2: 100..199 "b"; v3: DELETE id%10==4;
    * v4: merge (update 20..39 -> "m", insert 500..509 "m"). */
  private def buildSource(): String = {
    val t = fresh("src")
    CommitLog.append((0L until 100L).map(i => (i, "a")).toDF("id", "v"), t, publisher)
    CommitLog.append((100L until 200L).map(i => (i, "b")).toDF("id", "v"), t, publisher)
    CommitLog.deleteWhere(spark, t, schema, col("id") % 10 === 4, publisher)
    CommitLog.merge(spark, t, schema,
      ((20L until 40L).map(i => (i, "m")) ++ (500L until 510L).map(i => (i, "m")))
        .toDF("id", "v"), Seq("id"), publisher)
    t
  }

  test("drain ≡ batch recompute over the final snapshot, across deletes and merges") {
    val src = buildSource()
    val sink = fresh("sink")
    val d = CdcStream.drain(spark, src, schema, sink, transform,
      keyCols = Some(Seq("id")), maxVersionsPerBatch = 1L, publisher = publisher)
    assert(d.consumedThrough == CommitLog.liveFiles(spark, src)._1)
    assert(d.nBatches == 4, s"1-version batches over 4 commits, got ${d.nBatches}")
    assert(sinkRows(sink) == expected(src),
      "drained sink diverged from transform(final snapshot)")
    // deletes really crossed: a pre-delete row the transform kept is gone
    assert(!sinkRows(sink).exists(_._1 == 14L), "id=14 (deleted at v3) survived")
    // updates really applied net: id=20 carries the merged value
    assert(sinkRows(sink).contains((20L, "m", 1)))
    // caught up: another drain is a no-op
    val d2 = CdcStream.drain(spark, src, schema, sink, transform,
      keyCols = Some(Seq("id")), publisher = publisher)
    assert(d2.nBatches == 0 && d2.consumedThrough == d.consumedThrough)
  }

  test("bounded micro-batches: a far-behind consumer catches up in windows") {
    val src = buildSource()
    val sink = fresh("sink")
    val d = CdcStream.drain(spark, src, schema, sink, transform,
      keyCols = Some(Seq("id")), maxVersionsPerBatch = 3L, publisher = publisher)
    assert(d.nBatches == 2, s"4 versions / 3-per-batch = 2 batches, got ${d.nBatches}")
    assert(sinkRows(sink) == expected(src))
    // incremental tail: new source commits drain as ONLY the increment
    CommitLog.append((600L until 620L).map(i => (i, "late")).toDF("id", "v"), src, publisher)
    val d3 = CdcStream.drain(spark, src, schema, sink, transform,
      keyCols = Some(Seq("id")), publisher = publisher)
    assert(d3.nBatches == 1)
    assert(sinkRows(sink) == expected(src))
  }

  test("crash mid-drain: committed increments stay, replay resumes exactly-once") {
    val src = buildSource()
    val sink = fresh("sink")
    // crash AFTER batch 2's commit (the checkpoint rides the commit,
    // so the worst case is work-durable-then-crash)
    val boom = intercept[RuntimeException] {
      CdcStream.drain(spark, src, schema, sink, transform,
        keyCols = Some(Seq("id")), maxVersionsPerBatch = 1L, publisher = publisher,
        afterBatch = (n, _) => if (n == 2) throw new RuntimeException("crash"))
    }
    assert(boom.getMessage == "crash")
    assert(CommitLog.lastConsumed(spark, sink) == 2L,
      "the pre-crash increments must be durably consumed")
    // restart: resumes from the sink's own ledger, no re-application
    val d = CdcStream.drain(spark, src, schema, sink, transform,
      keyCols = Some(Seq("id")), maxVersionsPerBatch = 1L, publisher = publisher)
    assert(d.nBatches == 2, s"replay must consume only v3..v4, got ${d.nBatches}")
    assert(sinkRows(sink) == expected(src),
      "post-crash replay produced duplicates or lost rows")
  }

  test("applyChangesOnce with deletion vectors ≡ copy-on-write application") {
    val src = buildSource()
    val sinkSchema = Seq((0L, "v", 0)).toDF("id", "v", "w").schema
    def applyAll(dv: Boolean): (String, Set[String]) = {
      val sink = fresh(if (dv) "acomor" else "acocow")
      var since = 0L
      var b = 0L
      var afterFirst = Set.empty[String]
      val latest = CommitLog.latestVersion(spark, src)
      while (since < latest) {
        val until = math.min(since + 2, latest)
        CdcStream.applyChangesOnce(spark, sink, sinkSchema, Seq("id"),
          CommitLog.changesSince(spark, src, since, schema, asOf = until),
          "q1", b, transform, publisher, deletionVectors = dv)
        if (b == 0) afterFirst = CommitLog.liveFiles(spark, sink)._2.toSet
        since = until; b += 1
      }
      (sink, afterFirst)
    }
    val (cow, _) = applyAll(dv = false)
    val (mor, morFirst) = applyAll(dv = true)
    assert(sinkRows(mor) == expected(src), "MOR application diverged from batch")
    assert(sinkRows(mor) == sinkRows(cow))
    // the MOR sink never rewrote its first batch's files — later
    // increments vectored into them instead
    assert(morFirst.subsetOf(CommitLog.liveFiles(spark, mor)._2.toSet),
      "MOR application rewrote a pre-state sink file")
  }

  test("zombie refresh: losing the publish race to a competing driver aborts, never double-applies") {
    val src = fresh("src")
    CommitLog.append((0L until 100L).map(i => (i, "a")).toDF("id", "v"), src, publisher)
    val sink = fresh("sink")
    // a publisher that, at its first commit attempt, lets a COMPETING
    // driver consume the same increment first — the LoggedStoreSpec
    // race-injection pattern. Both refreshes passed the up-front
    // `since` check; the loser must hit the consumed-ledger fence on
    // its lost race and abort instead of committing a second copy.
    val sneaky = new AtomicPublisher {
      @volatile var injected = false
      def publish(fs: org.apache.hadoop.fs.FileSystem,
          log: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path,
          content: String): Boolean = {
        if (!injected && dst.getName.endsWith(".commit")) {
          injected = true
          IncrementalView.refresh(spark, src, schema, sink, transform,
            publisher, keyCols = Some(Seq("id")))
          ()
        }
        publisher.publish(fs, log, dst, content)
      }
    }
    val r = IncrementalView.refresh(spark, src, schema, sink, transform,
      sneaky, keyCols = Some(Seq("id")))
    assert(r == Some(1L), s"refresh should report the increment consumed: $r")
    assert(sinkRows(sink) == expected(src),
      "the zombie's losing refresh double-applied the increment")
    assert(CommitLog.lastConsumed(spark, sink) == 1L)
    // the zombie's orphaned staged files reclaim cleanly
    CommitLog.vacuum(spark, sink, minAgeMs = 0)
    assert(sinkRows(sink) == expected(src))
  }

  test("fence trips on the FIRST publish attempt: a competitor fully committed before any race") {
    val src = fresh("src")
    CommitLog.append((0L until 100L).map(i => (i, "a")).toDF("id", "v"), src, publisher)
    val sink = fresh("sink")
    // the competing driver runs to COMPLETION while this refresh is
    // still building its increment — the loser's first publish then
    // lands cleanly at latest+1 with NO race to lose, so an
    // attempts>0-only fence never fires and the increment applies
    // twice (ADVICE r10). Injection point: the transform, which runs
    // before this refresh stages anything.
    @volatile var injected = false
    val sneakyTransform: DataFrame => DataFrame = { df =>
      if (!injected) {
        injected = true
        IncrementalView.refresh(spark, src, schema, sink, transform,
          publisher, keyCols = Some(Seq("id")))
        ()
      }
      transform(df)
    }
    val r = IncrementalView.refresh(spark, src, schema, sink, sneakyTransform,
      publisher, keyCols = Some(Seq("id")))
    assert(r == Some(1L), s"refresh should report the increment consumed: $r")
    assert(sinkRows(sink) == expected(src),
      "a competitor committing BEFORE the first publish attempt was double-applied")
    assert(CommitLog.lastConsumed(spark, sink) == 1L)
  }

  test("a competitor consuming a SMALLER window aborts the wider refresh — overlap never double-applies") {
    val src = fresh("src")
    CommitLog.append((0L until 100L).map(i => (i, "a")).toDF("id", "v"), src, publisher)
    CommitLog.append((100L until 200L).map(i => (i, "b")).toDF("id", "v"), src, publisher)
    val sink = fresh("sink")
    // this refresh targets (0, 2]; the competitor drains only (0, 1]
    // (a smaller maxVersions window). A `lastConsumed >= srcVersion`
    // fence sees 1 < 2 and lets the wide refresh commit its FULL
    // range — double-applying (0, 1]. The fence must abort on ANY
    // ledger movement since the refresh read it.
    val sneaky = new AtomicPublisher {
      @volatile var injected = false
      def publish(fs: org.apache.hadoop.fs.FileSystem,
          log: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path,
          content: String): Boolean = {
        if (!injected && dst.getName.endsWith(".commit")) {
          injected = true
          IncrementalView.refresh(spark, src, schema, sink, transform,
            publisher, keyCols = Some(Seq("id")), maxVersions = Some(1L))
          ()
        }
        publisher.publish(fs, log, dst, content)
      }
    }
    val r = IncrementalView.refresh(spark, src, schema, sink, transform,
      sneaky, keyCols = Some(Seq("id")))
    assert(r == Some(1L),
      s"the aborted refresh must report the competitor's consumed version: $r")
    // catch up the remaining window and verify each row applied once
    val d = CdcStream.drain(spark, src, schema, sink, transform,
      keyCols = Some(Seq("id")), publisher = publisher)
    assert(d.consumedThrough == 2L)
    assert(sinkRows(sink) == expected(src),
      "the overlapping (0,1] range was applied twice")
  }

  test("bootstrap: a FRESH sink on a retention-trimmed source snapshots; a lagging sink stays loud") {
    val src = fresh("src")
    CommitLog.append((0L until 100L).map(i => (i, "a")).toDF("id", "v"), src, publisher)
    CommitLog.deleteWhere(spark, src, schema, col("id") < 10, publisher)
    CommitLog.vacuum(spark, src, minAgeMs = 0) // v1's originals are gone
    // fresh sink: day one, not data loss — snapshot bootstrap + tail
    val sink = fresh("sink")
    val d = CdcStream.drainWithBootstrap(spark, src, schema, sink, transform,
      keyCols = Some(Seq("id")), publisher = publisher)
    assert(d.consumedThrough == 2L && d.nBatches == 1L, d)
    assert(sinkRows(sink) == expected(src))
    // a sink that HAS consumed and then fell behind retention must keep
    // failing loudly — silently rebuilding would mask real feed loss
    val src2 = fresh("src2")
    CommitLog.append((0L until 50L).map(i => (i, "a")).toDF("id", "v"), src2, publisher)
    val sink2 = fresh("sink2")
    CdcStream.drain(spark, src2, schema, sink2, transform,
      keyCols = Some(Seq("id")), publisher = publisher)
    (0 until 11).foreach(i => CommitLog.append(
      (1000L * (i + 1) until 1000L * (i + 1) + 10).map(j => (j, "b")).toDF("id", "v"),
      src2, publisher))
    CommitLog.pruneLog(spark, src2) // commits ≤ checkpoint 10 are gone
    val e = intercept[FeedGapException] {
      CdcStream.drainWithBootstrap(spark, src2, schema, sink2, transform,
        keyCols = Some(Seq("id")), publisher = publisher)
    }
    assert(e.getMessage.contains("re-bootstrap"), e.getMessage)
    // the operator recovers EXPLICITLY
    IncrementalView.rebuild(spark, src2, schema, sink2, transform, publisher)
    assert(sinkRows(sink2) == expected(src2))
  }

  test("a source DELETE with no keyCols stops loudly; rebuild recovers") {
    val src = buildSource()
    val sink = fresh("sink")
    val e = intercept[IllegalStateException] {
      CdcStream.drain(spark, src, schema, sink, transform,
        keyCols = None, maxVersionsPerBatch = 10L, publisher = publisher)
    }
    assert(e.getMessage.contains("keyCols"), e.getMessage)
    IncrementalView.rebuild(spark, src, schema, sink, transform, publisher)
    assert(sinkRows(sink) == expected(src))
    assert(CdcStream.drain(spark, src, schema, sink, transform,
      keyCols = Some(Seq("id")), publisher = publisher).nBatches == 0)
  }
}

class CdcStreamSpec extends CdcStreamBehavior(RenameOrLinkPublisher)
class CdcStreamS3Spec extends CdcStreamBehavior(
  new ConditionalPutPublisher(new LocalConditionalPutStore))
