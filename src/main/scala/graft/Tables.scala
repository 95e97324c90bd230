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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Every declared query flows through here — make the graft native
    // functions (cosine, token hits, minhash bands) available on the
    // session regardless of how it was built. Idempotent and cheap.
    graft.functions.GraftFunctions.register(spark)
    if (name == "events") {
      // The fixture writes TIMESTAMP(NANOS), which Spark 4's parquet
      // reader rejects outright; read nanos as long and truncate to µs
      // (exactly what DuckDB's µs-native reader does on its side).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
