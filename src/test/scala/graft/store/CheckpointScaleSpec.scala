package graft.store

import graft.SparkSpec

import java.nio.file.Files

/** Checkpoint-open cost at large live-set scale (VERDICT r10 item #4):
  * the commit log's checkpoints are line-format text, and every read
  * replays newest-checkpoint + suffix on the driver. This spec
  * fabricates a checkpoint at the 10⁵-live-file scale (with per-file
  * stats payloads, the worst case for line length) plus a commit
  * suffix, and pins that a full replay — parse included — stays in
  * interactive territory. Measured on this harness: ~10⁵ stat-bearing
  * lines parse in well under a second; the format is length-prefix-free
  * text, so cost is linear in bytes with no JSON-object overhead. The
  * Delta-style parquet-checkpoint conversion stays unjustified until a
  * real table pushes live files another order of magnitude past this —
  * the numbers, not the pattern, make that call. */
class CheckpointScaleSpec extends SparkSpec {

  test("a 100k-file checkpoint (with stats) replays fast and correctly") {
    val t = Files.createTempDirectory("graft_ckscale").toString + "/t"
    val log = new org.apache.hadoop.fs.Path(t, "_graft_log")
    val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(log)
    val n = 100000
    // checkpoint at version 100000: n live files, each add line carrying
    // a realistic two-column stats suffix + the ledger headers
    val ckpt = new StringBuilder
    ckpt ++= "#txn=ingest:41\n#consumed=99998\n"
    var i = 0
    while (i < n) {
      ckpt ++= s"+w1_0_0-part-$i.parquet|" +
        s"""{"id":[${i * 1000L},${i * 1000L + 999}],"score":[0.0,1.0]}""" + "\n"
      i += 1
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(log, f"$n%020d.checkpoint"), true)
    out.write(ckpt.result().stripSuffix("\n").getBytes("UTF-8"))
    out.close()
    // a short commit suffix after the checkpoint (the steady state)
    (1 to 5).foreach { k =>
      val c = fs.create(new org.apache.hadoop.fs.Path(log, f"${n + k}%020d.commit"), true)
      c.write(s"#ts=${n + k}\n+w1_0_0-tail-$k.parquet".getBytes("UTF-8"))
      c.close()
    }
    // warm (JIT + FS metadata), then measure
    CommitLog.liveFiles(spark, t)
    val t0 = System.nanoTime()
    val (v, withStats) = CommitLog.liveFilesWithStats(spark, t)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(v == n + 5)
    assert(withStats.size == n + 5)
    // stats payloads survive the replay intact (the merge probe's input)
    assert(withStats.count(_._2.isDefined) == n)
    info(f"replayed ${withStats.size} live files in $ms%.1f ms")
    // generous bound: an interactive-latency budget, not a benchmark —
    // this fails only if the parse becomes accidentally quadratic or
    // starts buffering the world
    assert(ms < 5000, f"checkpoint replay took $ms%.1f ms for $n files")
    // the ledger headers carried by the checkpoint resolve without
    // touching pruned history
    assert(CommitLog.lastTxnBatch(spark, t, "ingest") == 41L)
    assert(CommitLog.lastConsumed(spark, t) == 99998L)
  }

  test("a 1M-file checkpoint (with stats) replays within the maintenance budget") {
    // the VERDICT r11 item-5 measurement: where text checkpoints would
    // cross into parquet-checkpoint territory. 10⁶ lines × ~85 B ≈
    // 85 MB of text; the pin is LINEARITY — 10× the 100k case's lines
    // must cost ~10× its time, never 100× (accidental quadratic). The
    // recorded decision lives in PLANS.md; re-run this spec to revisit
    // when live-file counts grow another order of magnitude.
    val t = Files.createTempDirectory("graft_ckscale1m").toString + "/t"
    val log = new org.apache.hadoop.fs.Path(t, "_graft_log")
    val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(log)
    val n = 1000000
    val out = fs.create(new org.apache.hadoop.fs.Path(log, f"$n%020d.checkpoint"), true)
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(out, "UTF-8"), 1 << 20)
    w.write("#txn=ingest:41\n#consumed=999998")
    var i = 0
    while (i < n) {
      w.write(s"\n+w1_0_0-part-$i.parquet|" +
        s"""{"id":[${i * 1000L},${i * 1000L + 999}],"score":[0.0,1.0]}""")
      i += 1
    }
    w.close()
    (1 to 5).foreach { k =>
      val c = fs.create(new org.apache.hadoop.fs.Path(log, f"${n + k}%020d.commit"), true)
      c.write(s"#ts=${n + k}\n+w1_0_0-tail-$k.parquet".getBytes("UTF-8"))
      c.close()
    }
    CommitLog.liveFiles(spark, t) // warm
    val t0 = System.nanoTime()
    val (v, withStats) = CommitLog.liveFilesWithStats(spark, t)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(v == n + 5)
    assert(withStats.size == n + 5)
    assert(withStats.count(_._2.isDefined) == n)
    info(f"replayed ${withStats.size} live files in $ms%.1f ms")
    assert(ms < 30000, f"checkpoint replay took $ms%.1f ms for $n files")
    fs.delete(new org.apache.hadoop.fs.Path(t), true)
  }
}
