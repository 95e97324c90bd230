package graft.plan

import graft.core.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Task templates + fan-out (SURVEY.md §2.2 F4, §2.3 P1, P2).
  *
  * A template is an applicability predicate plus a task constructor
  * (reference: internal/tasker/template/mov.go:21-46, mp4.go:21-46;
  * registry cmd/tasker.go:102-112). The templater applies EVERY
  * registered template to a resource and keeps the non-nil results, so
  * one resource yields 0..N tasks (template.go:26-35).
  *
  * Spark-first shape: each template contributes `when(applicable,
  * task_struct).otherwise(null)` to an array; the fan-out is
  * `explode(filter(array(...), isNotNull))` — a Generate node, fully
  * codegen'd, no UDF/flatMap needed. At 100 TB this is a narrow
  * transformation: no shuffle, multiplicity bounded by template count.
  *
  * Divergence (documented per SURVEY §7.5): template applicability here
  * is case-INsensitive on the extension. The reference's template check
  * is case-sensitive (`path.Ext(...) != ".mov"`, mov.go:24) while its
  * ingest filter lowercases (ingest/util.go:39) — so an ingested
  * `a.MOV` would silently never fan out there. We treat that as a bug,
  * not a behavior.
  */
final case class TemplateDef(
    name: String,          // hooks tag (task.go:28 Hooks)
    exts: Seq[String],     // applicability: url extension(s)
    image: String,         // execution config (executor_docker image analog)
    command: String,       // external command the execute stage runs
    timeoutS: Long)

object Templates {

  /** Default registry — mov/mp4 mirror the reference's two live
    * templates; "thumb" applies to both so .mov/.mp4 resources fan out
    * 1→2 (the multiplicity the reference's registry shape allows but
    * its disjoint predicates never exercise). */
  val mov: TemplateDef = TemplateDef("mov", Seq("mov"), "graft/mov:1", "process_mov", 48 * 3600L)
  val mp4: TemplateDef = TemplateDef("mp4", Seq("mp4"), "graft/mp4:1", "process_mp4", 48 * 3600L)
  val thumb: TemplateDef = TemplateDef("thumb", Seq("mov", "mp4"), "graft/thumb:1", "process_thumb", 3600L)
  val registry: Seq[TemplateDef] = Seq(mov, mp4, thumb)

  final case class PlanConfig(
      mirrorBucket: String = "mirror",
      mirrorPrefix: String = "chyme",
      metadataPrefix: String = "meta",
      version: String = "0.2")

  /** F4 applicability = the same extension semantics as the ingest
    * filter (ONE implementation — divergence here would let a resource
    * pass ingest but match no template, or vice versa). */
  private def extMatches(url: Column, exts: Seq[String]): Column =
    graft.ingest.Filters.extPredicate(url, exts)

  /** P1 — mirror-URL rewrite (mov.go:28-30): output is a directory-like
    * URL `s3://<mirror_bucket>/<mirror_prefix>/<template>/<src_bucket>/
    * <src_key>/`; src_bucket is the bucket's base name (local roots
    * stand in for buckets).
    *
    * The template name is part of the path — a deliberate generalization
    * of the reference (whose templates are extension-disjoint, so it
    * never needs one). Task identity is {input,output} (task.go:44-50);
    * two templates applying to the same resource must therefore write to
    * distinct outputs or they would be the "same" task and collapse in
    * dedup — and would race on the same output prefix at execution time.
    */
  def mirrorUrl(template: String, bucket: Column, key: Column, cfg: PlanConfig): Column =
    concat(lit(s"s3://${cfg.mirrorBucket}/${cfg.mirrorPrefix}/$template/"),
      element_at(split(bucket, "/"), -1), lit("/"), key, lit("/"))

  private def metadataUrl(template: String, bucket: Column, key: Column, cfg: PlanConfig): Column =
    concat(lit(s"s3://${cfg.mirrorBucket}/${cfg.metadataPrefix}/$template/"),
      element_at(split(bucket, "/"), -1), lit("/"), key, lit("/"))

  private def resourceStruct(url: Column, scheme: Column, bucket: Column,
      key: Column, size: Column, phony: Column): Column =
    struct(
      url.as("url"), scheme.as("scheme"), bucket.as("bucket"), key.as("key"),
      size.as("size"), phony.as("phony"), Hashing.urlHash(url).as("hash"))

  /** One template's task struct over resource columns, or null when not
    * applicable (templates.go:36-38). */
  def taskFor(t: TemplateDef, cfg: PlanConfig): Column = {
    val in = resourceStruct(col("url"), col("scheme"), col("bucket"), col("key"),
      col("size"), col("phony"))
    val outUrl = mirrorUrl(t.name, col("bucket"), col("key"), cfg)
    val metaUrl = metadataUrl(t.name, col("bucket"), col("key"), cfg)
    val out = resourceStruct(outUrl, lit("s3"), lit(cfg.mirrorBucket),
      concat(lit(s"${cfg.mirrorPrefix}/${t.name}/"), element_at(split(col("bucket"), "/"), -1),
        lit("/"), col("key"), lit("/")),
      lit(0L), lit(false))
    val meta = resourceStruct(metaUrl, lit("s3"), lit(cfg.mirrorBucket),
      concat(lit(s"${cfg.metadataPrefix}/${t.name}/"), element_at(split(col("bucket"), "/"), -1),
        lit("/"), col("key"), lit("/")),
      lit(0L), lit(true)) // metadata resource is phony until written
    when(extMatches(col("url"), t.exts),
      struct(
        in.as("input"),
        out.as("output"),
        meta.as("metadata"),
        lit(t.name).as("hooks"),
        struct(
          lit("process").as("executor"),
          map(lit("image"), lit(t.image), lit("command"), lit(t.command)).as("config"))
          .as("strategy"),
        lit(t.timeoutS).as("timeout_s"),
        lit(cfg.version).as("version"),
        Hashing.taskHash(col("url"), outUrl).as("task_hash")))
      .otherwise(lit(null))
  }

  /** P2 — templater fan-out: resources → 0..N task rows. */
  def fanOut(resources: org.apache.spark.sql.DataFrame,
      templates: Seq[TemplateDef] = registry,
      cfg: PlanConfig = PlanConfig()): org.apache.spark.sql.DataFrame = {
    val tasks = array(templates.map(taskFor(_, cfg)): _*)
    resources
      .withColumn("task", explode(filter(tasks, _.isNotNull)))
      .select(col("task.*"))
  }
}
