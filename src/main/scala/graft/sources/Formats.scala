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
}
