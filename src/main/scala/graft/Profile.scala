package graft

import org.apache.spark.scheduler._

import scala.collection.mutable.ArrayBuffer

/** Stage-level profiler for a declared query — the guide §1 "decide
  * whether the time is going to shuffle read, shuffle write, executor
  * compute, scheduler delay" loop, headless (spark.ui is disabled in
  * this harness, so the Stages tab is reconstructed from listener
  * events). Prints, per run, the wall time and every stage's wall,
  * task count, task-time sum, shuffle bytes and records — the evidence
  * OPTIMIZATION_r16.md quotes.
  *
  * Usage: tools/run.sh graft.Profile <queryName> [sfDir] [runs]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Profile <query> [sfDir] [runs]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local("graft-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    final case class St(id: Int, name: String, wallMs: Long, tasks: Int,
        taskTimeMs: Long, shufReadMB: Double, shufWriteMB: Double,
        inRec: Long, outRows: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (a <- si.submissionTime; b <- si.completionTime) yield b - a).getOrElse(-1L)
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
            si.numTasks, m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.recordsRead, m.outputMetrics.recordsWritten)
          ()
        }
      }
    })

    // Sweep mode: `Profile ALL [sfDir]` times EVERY declared query once
    // (warm JVM amortized across the sweep) and prints them sorted by
    // cost — the guide §1 "find the slowest thing first" ranking over
    // the whole 240-query surface, which Bench (10 headliners) and
    // Verify (no timing) cannot give. Measurement only; noop sink.
    if (name == "ALL") {
      val timed = SparkEntry.allQueries.map { q =>
        val t0 = System.nanoTime()
        val ok = try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch { case e: Throwable =>
          System.err.println(s"[profile] ${q.name} FAILED: ${e.getMessage}"); false
        }
        (q.name, (System.nanoTime() - t0) / 1e9, ok)
      }
      timed.sortBy(-_._2).foreach { case (n, t, ok) =>
        println(f"$t%8.3f s  $n${if (ok) "" else "  FAILED"}") }
      println(f"TOTAL ${timed.map(_._2).sum}%.3f s over ${timed.size} queries")
      spark.stop()
      return
    }

    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    spark.sparkContext.setJobDescription(s"profile: $name warm-up")
    val warm = once() // JIT + footer warm-up, same as Bench
    println(f"[$name] warm-up: $warm%.3f s")
    (1 to runs).foreach { r =>
      stages.synchronized(stages.clear())
      spark.sparkContext.setJobDescription(s"profile: $name run $r")
      val w = once()
      // stage completion events race the action's return: drain briefly
      Thread.sleep(200)
      val ss = stages.synchronized(stages.sortBy(_.id).toList)
      val covered = ss.map(_.wallMs).sum / 1e3
      println(f"\n[$name] run $r: wall $w%.3f s, ${ss.size} stages " +
        f"(stage-wall sum $covered%.3f s; gap = driver/planning/commit)")
      ss.foreach { s =>
        println(f"  stage ${s.id}%4d ${s.tasks}%3dt wall ${s.wallMs}%5d ms " +
          f"taskSum ${s.taskTimeMs}%5d ms shufR ${s.shufReadMB}%7.2f MB " +
          f"shufW ${s.shufWriteMB}%7.2f MB inRec ${s.inRec}%9d  ${s.name}")
      }
    }
    spark.stop()
  }
}
