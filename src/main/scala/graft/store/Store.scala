package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Engine-owned table layer (SURVEY.md §7.1, K9 analog).
  *
  * The reference keeps pipeline state in external systems — a Redis SET as
  * the resource index (resource.go:77-87), SQS as the task queue, a Redis
  * SET of task hashes as the done-registry (task.go:157-179), and an SQS
  * DLQ (task.go:132-147). Here state lives in parquet tables under one
  * work root; every job is a pure DataFrame transform between tables, so
  * Spark's planner sees the whole pipeline.
  *
  * Scale: append-only writes, partitioned by Spark's natural output
  * partitioning (no driver materialization); dedup/claim joins are
  * key-partitioned shuffles or broadcast anti-joins depending on AQE's
  * runtime sizes. At cluster scale these paths would be s3a:// prefixes
  * (or Delta tables for ACID appends) — the API is path-based so nothing
  * else changes.
  */
final case class Store(root: String) {
  val resourceIndex: String = s"$root/resource_index"
  val taskQueue: String = s"$root/task_queue"
  val taskDone: String = s"$root/task_done"
  val dlq: String = s"$root/dlq"
  val metadata: String = s"$root/metadata"
}

object Store {

  /** Read a parquet table, or an empty frame with the given schema when
    * the table doesn't exist yet (first run). */
  def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}
