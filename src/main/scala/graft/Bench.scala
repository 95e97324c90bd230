package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"value":...,"queries":{...}}.
  *
  * Runs each query once untimed (JIT + parquet footer warm-up), then takes
  * the MIN OF THREE timed runs — the one-JVM min-of-3 protocol the
  * interleaved A/B adjudications (BENCH_AB_r08/r11/r15) converged on:
  * per-query minima are the stable statistic on a box whose run-to-run
  * spread (±17%) dwarfs real regressions; means re-litigate noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def timeOnce(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      fn()
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.benchQueries.map { q =>
      val run = () => { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); () }
      try {
        run() // warm-up
        (q.name, Seq.fill(3)(timeOnce(run)).min, true)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] FAILED ${q.name}: ${e.getMessage}")
          (q.name, -1.0, false)
      }
    }

    // A failed query must not read as a speedup: report the failed list
    // explicitly, and exit non-zero so the driver sees the regression.
    val failed = results.collect { case (n, _, false) => n }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    // The round-1 bench set, as its own subtotal: "value" grew because the
    // LLM-operator headliners were ADDED to the bench — like-for-like
    // comparison against BENCH_r01 uses this field, not the new total.
    val r1Set = Set("q1_pricing_summary", "q2_forecast_revenue",
      "q3_revenue_by_nation", "q7_top_customers_per_nation", "q21_brand_supplier_volume")
    val r1Total = results.filter(r => r._3 && r1Set(r._1)).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"r1_subset_total":$r1Total,"runs":3,"stat":"min","sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
