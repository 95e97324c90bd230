package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * One parquet file per table under /root/testdata/sf{0.001,0.01,0.1}. All queries take
  * the sf directory as a parameter so the same code runs at every scale
  * factor — at cluster scale the same paths would be s3a:// prefixes and
  * Catalyst's InMemoryFileIndex handles the (parallel) listing.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
