package graft.plan

import graft.ingest.Ingest
import graft.store.Store
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The plan (tasker) job — SURVEY.md §2.3 P1/P2, §2.4 D3.
  *
  * Reference: the tasker pops a resource batch from the Redis set, fans
  * each resource out through the template registry, enqueues tasks to
  * SQS and SADDs their hashes (internal/tasker/service.go:85-132). Its
  * intended-but-commented task dedup (service.go:104-112) is implemented
  * here for real: a left-anti join of the fanned-out tasks against both
  * `task_done` and the pending `task_queue` on task_hash, so re-planning
  * is idempotent and completed work is never re-enqueued.
  *
  * Scale: fan-out is a narrow Generate (no shuffle); the two anti-joins
  * hash-partition on task_hash — or broadcast when the done/pending sets
  * are small, AQE's call. The resource set is never collected.
  */
object Plan {

  private[graft] def hashOnly(spark: SparkSession, path: String): DataFrame =
    Store.readOrEmpty(spark, path,
      StructType(Seq(StructField("task_hash", StringType))))
      .select("task_hash")

  /** The planning core shared by the batch job and the streaming tasker
    * (StreamingJobs.planStream): fan the given resources out through
    * the templates and drop anything already done or already queued —
    * ONE implementation, so batch and streaming planners can never
    * derive different task identities for the same resources. */
  private[graft] def freshTasks(spark: SparkSession, resources: DataFrame, store: Store,
      templates: Seq[TemplateDef], cfg: Templates.PlanConfig): DataFrame = {
    val tasks = Templates.fanOut(resources, templates, cfg)
      .dropDuplicates("task_hash")
    tasks
      .join(hashOnly(spark, store.taskDone), Seq("task_hash"), "left_anti")
      .join(hashOnly(spark, store.taskQueue), Seq("task_hash"), "left_anti")
      .select(tasks.columns.map(col): _*) // stable column order across appends
  }

  /** Fan out un-planned resources into task_queue; returns tasks added.
    * The plan-and-append runs under the queue lock: an append landing
    * inside a concurrent batch drain's snapshot→swap window would be
    * silently dropped by the queue rewrite (see StoreLock). */
  def run(spark: SparkSession, store: Store,
      templates: Seq[TemplateDef] = Templates.registry,
      cfg: Templates.PlanConfig = Templates.PlanConfig()): Long =
    graft.store.StoreLock.withLock(spark, store, "task_queue") {
      val resources = Store.readOrEmpty(spark, store.resourceIndex, Ingest.resourceSchema)
      val fresh = freshTasks(spark, resources, store, templates, cfg)
      // count via the written table so the number reflects what landed
      val before = hashOnly(spark, store.taskQueue).count()
      Store.append(fresh, store.taskQueue)
      hashOnly(spark, store.taskQueue).count() - before
    }
}
