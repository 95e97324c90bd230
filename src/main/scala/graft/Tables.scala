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

  /** Footer-inferred schema per fixture path, once per JVM. Without
    * this every `spark.read.parquet` runs a one-task schema-inference
    * job (~40-60 ms of driver+scheduler overhead at any scale — q3
    * paid four of them per bench run; guide §1 measured it, §5 "the
    * driver should do almost no data work" motivates it). Fixture
    * paths are immutable for the life of a JVM (the driver regenerates
    * fixtures only between processes; streaming stages are
    * content-keyed paths), so the cache can never serve a stale
    * schema. Metadata only — never rows: every query still computes
    * from the parquet inputs. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Read a parquet path with the (cached) footer schema — one
    * inference job per path per JVM instead of one per query run. */
  def readCached(spark: SparkSession, path: String): DataFrame = {
    val sch = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(path)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Every declared query flows through here — make the graft native
    // functions (cosine, token hits, minhash bands) available on the
    // session regardless of how it was built. Idempotent and cheap.
    graft.functions.GraftFunctions.register(spark)
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      // Fixture generations have written `ts` as TIMESTAMP(NANOS) (which
      // Spark 4's parquet reader only admits as long via the legacy flag)
      // and as native timestamp[us]/TIMESTAMP_NTZ. Branch on the schema
      // actually read rather than assuming one: nanos-as-long gets
      // truncated to µs (what DuckDB's µs-native reader does), a native
      // timestamp passes through. Both branches land on TimestampType so
      // downstream windows/oracle hashing see one type regardless of the
      // fixture vintage (session tz is UTC, so the NTZ cast is
      // value-preserving).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = readCached(spark, s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else readCached(spark, s"$dir/$name.parquet")
  }

  /** Register every fixture table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
