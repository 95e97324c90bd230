package graft

import org.apache.spark.sql.SparkSession

/** The ONE place the engine's local SparkSession defaults live — Cli,
  * Bench and Verify previously each duplicated this block (and could
  * drift). `SPARK_MASTER` overrides the master for cluster submission;
  * shuffle partitions track the core count (the brief's local[32]
  * sizing, not the 200 default). */
object Sessions {
  def local(appName: String, cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // logged tables as first-class SQL tables: the `graft` catalog
      // plus the extensions (functions, TVFs, and the read-upgrade
      // rule that keeps catalog SELECTs on the native scan path)
      .config("spark.sql.catalog.graft", "graft.store.GraftCatalog")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
