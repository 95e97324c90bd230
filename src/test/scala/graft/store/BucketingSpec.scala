package graft.store

import graft.SparkSpec

/** The external-table semantics Bucketing relies on (round-5 review):
  * a session that finds the content-keyed files already on disk must
  * REGISTER them (CREATE ... CLUSTERED BY ... LOCATION) without
  * rewriting or deleting — that is what makes the shared warehouse
  * safe for a second JVM — and the registered table must still scan
  * as bucketed. */
class BucketingSpec extends SparkSpec {

  test("re-registration over existing files: same name, no rewrite, still bucketed") {
    val name = Bucketing.ensureBucketed(spark, sf("sf0.001"), "orders", "o_orderkey", 8)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileStamps(): Map[String, Long] =
      fs.listStatus(loc).map(st => st.getPath.getName -> st.getModificationTime).toMap
    val before = fileStamps()
    assert(before.nonEmpty)

    // simulate a fresh session's empty catalog: drop the (external)
    // entry — files must survive the drop
    spark.sql(s"DROP TABLE $name")
    assert(fs.exists(loc), "dropping the external table must not delete its files")

    val name2 = Bucketing.ensureBucketed(spark, sf("sf0.001"), "orders", "o_orderkey", 8)
    assert(name2 == name, "same content must key the same table name")
    assert(fileStamps() == before, "re-registration must not rewrite the files")

    // and the register-only path still plans bucketed scans — probed
    // through a bucket-key aggregation (a bare scan reports "Bucketed:
    // false (disabled by query planner)" because bucketing buys it
    // nothing): the agg's required distribution is satisfied by the
    // bucket layout, so NO exchange may appear
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val agg = spark.table(name2).groupBy("o_orderkey").count()
      val shuffles = agg.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucket-key aggregation shuffled — registration lost the bucket spec:\n" +
          agg.queryExecution.executedPlan)
      assert(agg.queryExecution.executedPlan.toString.contains("Bucketed: true"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
