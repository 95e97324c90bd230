package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE filesystem primitive the commit-log protocol needs: publish
  * `content` at `dst` atomically, if and only if `dst` does not exist.
  * Exactly one concurrent publisher of a given `dst` returns true; the
  * rest return false and retry at the next version number. Everything
  * else in CommitLog (optimistic version race, rewrite validation,
  * checkpoints, vacuum) is publisher-agnostic — this seam is what a
  * deployment swaps per storage class.
  */
trait AtomicPublisher {
  /** True = won (dst now exists with `content`); false = lost the race
    * (someone else owns dst). Content must become visible atomically
    * with the win — a reader may never observe a partial commit file. */
  def publish(fs: FileSystem, logDir: Path, dst: Path, content: String): Boolean
}

/** Default publisher for filesystems with an exclusive-create
  * primitive: HDFS rename refuses an existing destination
  * namenode-side; POSIX rename REPLACES, so file:// publishes via hard
  * link (createLink throws FileAlreadyExistsException atomically).
  * Content is staged to a `_tmp_` sibling first, so the destination
  * only ever appears fully written; the tmp is reclaimed on EVERY
  * non-win path — including unexpected IO failures — since vacuum()
  * never touches the log directory and an orphan there would be
  * unreclaimable. */
object RenameOrLinkPublisher extends AtomicPublisher {
  def publish(fs: FileSystem, logDir: Path, dst: Path, content: String): Boolean = {
    val tmp = new Path(logDir,
      s"_tmp_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    var won = false
    try {
      val out = fs.create(tmp, false)
      try { out.write(content.getBytes("UTF-8")) } finally out.close()
      won =
        if (fs.getScheme == "file") {
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(dst.toUri.getPath),
              java.nio.file.Paths.get(tmp.toUri.getPath))
            true
          } catch { case _: java.nio.file.FileAlreadyExistsException => false }
        } else fs.rename(tmp, dst)
      won
    } finally {
      // hard-link wins still leave the tmp name behind; rename wins
      // consumed it (delete is then a no-op). Losses and exceptions of
      // any kind must not leak the tmp.
      if (fs.getScheme == "file" || !won) { fs.delete(tmp, false); () }
    }
  }

  override def toString = "rename-or-link"
}

/** S3-class publisher: object stores have NO atomic rename (rename is
  * copy+delete, and a plain PUT is last-writer-wins), but every major
  * one now exposes a CONDITIONAL PUT — create-if-absent enforced
  * server-side (S3 `If-None-Match: *`, GCS `ifGenerationMatch: 0`,
  * Azure `If-None-Match: *`). That single primitive is sufficient: the
  * commit file is PUT whole under its version-numbered key, exactly one
  * concurrent writer's PUT is accepted, and the rest see the
  * precondition failure and retry at the next version — no staging
  * file, no rename, no coordination service.
  *
  * The store side is abstracted as [[ConditionalPutStore]]: production
  * binds it to the object-store SDK call; tests bind
  * [[LocalConditionalPutStore]], a local-directory emulation of the
  * semantics above. Note only the LOG needs this primitive — data
  * files land under writer-unique names that never collide, so plain
  * PUTs suffice for them on any store. */
final class ConditionalPutPublisher(store: ConditionalPutStore) extends AtomicPublisher {
  def publish(fs: FileSystem, logDir: Path, dst: Path, content: String): Boolean =
    store.putIfAbsent(dst.toUri.getPath, content.getBytes("UTF-8"))

  override def toString = s"conditional-put($store)"
}

/** The object-store write API the conditional-PUT publisher consumes:
  * one call, server-side atomicity. `key` is the full object key
  * (here: an absolute path). */
trait ConditionalPutStore {
  /** Atomically create the object iff absent; false = it existed. */
  def putIfAbsent(key: String, content: Array[Byte]): Boolean
}

/** Local emulation of an S3-class store's conditional PUT for driving
  * the full LoggedStoreSpec suite against the ConditionalPutPublisher
  * without network egress. Models the object-store contract faithfully
  * from the CLIENT's view:
  *
  *  - no rename, no hard links, no append — the object is PUT whole;
  *  - the existence check and the create are ONE atomic operation,
  *    serialized by the store (here: a JVM-wide lock standing in for
  *    the service's server-side serialization — real S3 serializes
  *    conditional PUTs per key across all clients; a process-local
  *    lock is the honest local-harness equivalent, same as every
  *    object-store test fixture);
  *  - a losing PUT leaves no trace.
  */
final class LocalConditionalPutStore extends ConditionalPutStore {
  def putIfAbsent(key: String, content: Array[Byte]): Boolean =
    LocalConditionalPutStore.gate.synchronized {
      val p = java.nio.file.Paths.get(key)
      if (java.nio.file.Files.exists(p)) false
      else {
        // Write-then-ATOMIC_MOVE, not create-in-place: an object store's
        // conditional PUT makes the object visible whole or not at all,
        // and the AtomicPublisher contract promises readers never see a
        // partial commit file. A CREATE_NEW + write here would let a
        // reader outside the gate observe the half-written object — a
        // fidelity gap a racing-reader stress run can hit.
        java.nio.file.Files.createDirectories(p.getParent)
        val tmp = java.nio.file.Files.createTempFile(p.getParent, "_put_", ".tmp")
        try {
          java.nio.file.Files.write(tmp, content)
          java.nio.file.Files.move(tmp, p,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } finally {
          java.nio.file.Files.deleteIfExists(tmp); ()
        }
        true
      }
    }

  override def toString = "local-emulation"
}

object LocalConditionalPutStore {
  /** JVM-wide: all emulated "clients" in one test JVM share the
    * store-side serialization point, as they would share S3's. */
  private val gate = new Object
}
