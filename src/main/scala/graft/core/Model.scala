package graft.core

/** Core data model — Spark-native re-expression of the reference's two
  * fundamental abstractions (SURVEY.md §1.1).
  *
  * A Resource is one addressable object (reference:
  * internal/core/resource.go:15-20 — `{Url, Phony, hash}`); here it is a
  * row with the URL pre-split into scheme/bucket/key so predicates and
  * joins never re-parse strings, plus the object size (the reference
  * fetches size separately per HeadObject, pkg/aws/s3.go:281-287 — at
  * scale the listing already carries it, so we keep it on the row).
  *
  * A Task is one unit of processing (internal/core/task.go:21-35):
  * input/output/metadata resources, an execution strategy (executor name
  * + string-keyed config, executor.go:25-29), a hooks tag, a timeout and
  * a version. Identity is `task_hash` — order-insensitive over
  * {input, output} (task.go:44-50, pkg/hash/hash.go:26-40).
  *
  * Both are plain case classes so `Dataset[Resource]`/`Dataset[Task]`
  * encoders are derived; the DataFrame schema is the product-encoder
  * StructType (FIXTURES.md §2).
  */
final case class Resource(
    url: String,
    scheme: String,
    bucket: String,
    key: String,
    size: Long,
    phony: Boolean,
    hash: String)

final case class ExecutionStrategy(
    executor: String,
    config: Map[String, String])

final case class Task(
    input: Resource,
    output: Resource,
    metadata: Resource,
    hooks: String,
    strategy: ExecutionStrategy,
    timeout_s: Long,
    version: String,
    task_hash: String)

/** Result of executing one task (executor.go:18-22), flattened for the
  * task_done / dlq tables: error is null on success. bytes_in/bytes_up
  * are the A3 transfer counters (the reference wraps readers/writers in
  * CountingReader/CountingWriterAt, pkg/util/util.go:8-52; here the
  * counts ride the result row and aggregate for free). */
final case class ExecutionResult(
    task_hash: String,
    input_url: String,
    output_url: String,
    hooks: String,
    exit_code: Int,
    error: String,
    output_files: Long,
    bytes_in: Long,
    bytes_up: Long,
    elapsed_ms: Long)
