package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Structured source/sink surface beyond parquet (SURVEY §2.9 file
  * formats: the reference handles only opaque binaries + JSON metadata;
  * the engine adds csv/json/parquet as first-class structured formats
  * via spark.read/write — schema-explicit, so at scale the reader never
  * pays an inference pass over 100 TB).
  */
object Formats {

  /** Stage a frame through a format and read it back schema-explicit —
    * the round-trip the format queries verify value-for-value. */
  def roundTrip(df: DataFrame, format: String, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    df.write.mode("overwrite").format(format).options(options).save(path)
    read(spark, format, df.schema, path, options)
  }

  def read(spark: SparkSession, format: String, schema: StructType,
      path: String, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).schema(schema).load(path)

  val csvOptions: Map[String, String] =
    Map("header" -> "true", "quote" -> "\"", "escape" -> "\"")

  /** Hive-style partitioned-layout round-trip: write `df` with one
    * directory per `partitionCol` value, read the tree back. At 100 TB
    * the layout IS the index — a filter on the partition column prunes
    * whole directories before any IO (the scan's PartitionFilters,
    * pinned by PlanAuditSpec), so per-language / per-source jobs read
    * only their slice of the corpus. Partition values here are alpha
    * tags, so type inference can't mis-narrow them.
    *
    * The tree is staged content-keyed (Staging.contentKeyed: writer-
    * unique tmp + rename publish, keyed by a fingerprint of `src`) —
    * a fixed shared path would race concurrent JVMs (one overwrite
    * deleting part-files under another's live scan) and re-write the
    * whole table on every call even when the source is unchanged. */
  def partitionedRoundTrip(df: DataFrame, src: String, stageRoot: String,
      partitionCol: String): DataFrame = {
    val spark = df.sparkSession
    val stage = graft.store.Staging.contentKeyed(spark, src, stageRoot,
      salt = s"partitioned|$partitionCol") { tmp =>
      df.write.partitionBy(partitionCol).parquet(tmp)
    }
    spark.read.parquet(stage)
  }

  /** PERMISSIVE read with quarantine routing (SURVEY §2.1 S4's
    * corrupt-record mapping, K6's quarantine applied to sources): rows
    * that fail to parse land in `_corrupt_record` instead of killing
    * the job; the caller gets (good, quarantined) frames and appends
    * the latter to a dlq table. At scale this is the difference between
    * one bad line failing a 100 TB load and a bounded quarantine audit.
    */
  def readWithQuarantine(spark: SparkSession, format: String,
      schema: StructType, path: String,
      options: Map[String, String] = Map.empty): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{StringType, StructField}
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val raw = spark.read.format(format)
      .options(options)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .load(path)
      .cache() // required: corrupt-record queries must not prune the raw columns
    val good = raw.filter(raw("_corrupt_record").isNull)
      .select(schema.fieldNames.map(raw(_)): _*)
    val bad = raw.filter(raw("_corrupt_record").isNotNull)
      .select(raw("_corrupt_record").as("corrupt_record"))
    (good, bad)
  }
}
