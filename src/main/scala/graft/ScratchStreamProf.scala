package graft

import org.apache.spark.sql.streaming.OutputMode

/** Throwaway measurement main (NOT a declared query; deleted after use):
  * prints per-trigger durationMs + stateOperators breakdown for the
  * stream_window_agg drain. */
object ScratchStreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-scratch", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val (_, q) = graft.streaming.StreamingJobs.runToMemoryWithQuery(
        graft.streaming.StreamingJobs.windowedEventCountsStream(spark, sfDir),
        s"scratch_sink_$r", OutputMode.Complete())
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"run $r wall $wall%.3f s, ${q.recentProgress.length} triggers")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"    state: commitTime=${so.allUpdatesTimeMs}upd/${so.commitTimeMs}commit rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes}")
        }
      }
    }
    spark.stop()
  }
}
