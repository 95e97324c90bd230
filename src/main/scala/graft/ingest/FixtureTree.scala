package graft.ingest

import java.nio.file.{Files, Paths, Path}

/** Deterministic local directory tree standing in for the reference's S3
  * bucket (FIXTURES.md §2) — used by the ingest correctness queries and
  * the unit tests. Mixed-case extensions, a no-extension file, and
  * depth-2/-3 nesting exercise the ext-filter and --recursion corners.
  *
  * File content is its own key, so sizes are deterministic and the
  * DuckDB oracle can pin them as constants.
  */
object FixtureTree {

  val root = "/tmp/graft_bucket"

  val keys: Seq[String] = Seq(
    "video/a.MOV",
    "video/b.mov",
    "video/c.mp4",
    "video/deep/d.mov",
    "video/deep/deeper/e.mov",
    "video/noext",
    "docs/readme.txt")

  /** (Re)build the tree from scratch; idempotent and always consistent. */
  def ensure(): String = synchronized {
    val rootP = Paths.get(root)
    if (Files.exists(rootP)) deleteRecursively(rootP)
    keys.foreach { k =>
      val p = rootP.resolve(k)
      Files.createDirectories(p.getParent)
      Files.write(p, k.getBytes("UTF-8"))
      ()
    }
    root
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toVector.foreach(deleteRecursively)
      s.close()
    }
    Files.deleteIfExists(p)
    ()
  }
}
