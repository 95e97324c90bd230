package graft.queries

import graft.Q
import graft.exec.Execute
import graft.ingest.{FixtureTree, Ingest}
import graft.plan.Plan
import graft.store.Store
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** X4/K4 closure — the reference's telemetry-metadata path end to end:
  * the MP4 pipeline writes `metadata.json` (images/mp4/process_mp4.sh:
  * 5-7, the `gopro` binary's output), the metadata sink uploads it
  * under the metadata resource keyed by task hash (task.go:248-261),
  * and downstream it becomes a typed column via spark.read.json — the
  * "extracted telemetry as a multimodal metadata column" flow that
  * SURVEY §2.6 X4 calls out.
  */
object MetadataQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "pipeline_metadata_extract",
      """SELECT 'gopro' AS device, CAST(3 AS BIGINT) AS n_samples,
        |       CAST(1 AS BIGINT) AS n_metadata_files""".stripMargin) { (s, _) =>
      FixtureTree.ensure()
      val store = Store("/tmp/graft_state/meta_extract")
      Seq(store.resourceIndex, store.taskQueue, store.taskDone, store.dlq)
        .foreach(Store.delete(s, _))
      val obj = Files.createTempDirectory("graft_obj_meta").toString
      // one .mp4 in the fixture tree → one mp4 task (+ one thumb task)
      Ingest.run(s, FixtureTree.root, "ext/mp4", 4, store)
      Plan.run(s, store)
      Execute.run(s, store, obj)
      // the K4 metadata sink landed metadata.json under the metadata
      // resource (mirror/meta/<template>/.../<task_hash>/); scope the
      // scan there — the task's own output dir carries a second copy
      val metaFiles = s.read.format("binaryFile")
        .option("pathGlobFilter", "metadata.json")
        .option("recursiveFileLookup", "true")
        .load(s"$obj/mirror/meta")
      val parsed = metaFiles
        .select(from_json(col("content").cast("string"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("device",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("samples",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.IntegerType))))).as("m"))
      parsed.agg(
        first(col("m.device")).as("device"),
        first(size(col("m.samples"))).cast("long").as("n_samples"),
        count(lit(1)).as("n_metadata_files"))
    })
}
