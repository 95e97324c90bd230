package graft.exec

import graft.core.Task

import java.nio.file.{Files, Path, StandardOpenOption}

/** T8 — the lifecycle-hook surface (the engine's "UDF" seam).
  *
  * Reference: `hooks.Interface{PreDownload, PreExecute, PreUpload,
  * PostUpload}` with a registry keyed by the task's `Hooks` tag
  * (internal/worker/hooks/hooks.go:10-35, dispatch worker/service.go:85-89,
  * wiring cmd/worker.go:88-98); the MOV/MP4 implementations only print
  * (hooks/mov.go:16-34, mp4.go:16-34); an unknown key fails the task to
  * the DLQ (service.go:86-89).
  *
  * Spark shape (SURVEY §7.4): a plain Scala function registry — hooks
  * run executor-side inside the mapPartitions stage, so they need no
  * Catalyst surface. A hook that throws fails the task into the DLQ,
  * exactly like any other execution error. The default implementations
  * append stage markers to the task's internal dir (the observable
  * analog of the reference's prints) so order is assertable.
  */
object Hooks {

  /** What a hook sees: the task plus its workspace. */
  final case class Ctx(task: Task, inputDir: Path, outputDir: Path, internalDir: Path)

  /** Four edges around the execute stage (hooks.go:10-35). Default:
    * no-op, so implementations override only the edges they need. */
  trait Interface extends Serializable {
    def preDownload(ctx: Ctx): Unit = ()
    def preExecute(ctx: Ctx): Unit = ()
    def preUpload(ctx: Ctx): Unit = ()
    def postUpload(ctx: Ctx): Unit = ()
  }

  object Noop extends Interface

  /** Default media hooks: append "<stage>:<tag>" to internal/hooks.log
    * — the reference's print statements, made assertable. */
  final class Logging(tag: String) extends Interface {
    private def mark(ctx: Ctx, stage: String): Unit = {
      Files.write(ctx.internalDir.resolve("hooks.log"),
        s"$stage:$tag\n".getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      ()
    }
    override def preDownload(ctx: Ctx): Unit = mark(ctx, "pre_download")
    override def preExecute(ctx: Ctx): Unit = mark(ctx, "pre_execute")
    override def preUpload(ctx: Ctx): Unit = mark(ctx, "pre_upload")
    override def postUpload(ctx: Ctx): Unit = mark(ctx, "post_upload")
  }

  /** Registry keyed by Task.hooks (cmd/worker.go:88-98). Unknown key →
    * None → the caller routes the task to the DLQ. */
  val registry: Map[String, Interface] = Map(
    "" -> Noop,
    "mov" -> new Logging("mov"),
    "mp4" -> new Logging("mp4"),
    "thumb" -> new Logging("thumb"))

  def resolve(tag: String): Option[Interface] = registry.get(tag)
}
