package graft.store

import graft.SparkSpec

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** The advisory queue lock that serializes planner appends against the
  * batch drain's queue rewrite (the lost-update defense). */
class StoreLockSpec extends SparkSpec {

  private def freshStore(): Store =
    Store(Files.createTempDirectory("graft_lock").toString)

  test("mutual exclusion: two writers never hold the lock at once") {
    val store = freshStore()
    val holders = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        StoreLock.withLock(spark, store, "task_queue") {
          val now = holders.incrementAndGet()
          maxSeen.updateAndGet(math.max(_, now))
          Thread.sleep(150)
          holders.decrementAndGet()
          ()
        })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(maxSeen.get() == 1, s"${maxSeen.get()} writers inside the critical section")
  }

  test("acquisition times out against a held (or stale) lock, naming the file") {
    val store = freshStore()
    Files.write(Paths.get(store.root, ".lock_task_queue"), "pid=stale\n".getBytes)
    val e = intercept[IllegalStateException] {
      StoreLock.withLock(spark, store, "task_queue", timeoutMs = 300) { () }
    }
    assert(e.getMessage.contains(".lock_task_queue"))
  }

  test("lock file is released after the body, including on exception") {
    val store = freshStore()
    val lockFile = Paths.get(store.root, ".lock_task_queue")
    StoreLock.withLock(spark, store, "task_queue") {
      assert(Files.exists(lockFile), "lock not held inside the section")
    }
    assert(!Files.exists(lockFile))
    intercept[RuntimeException] {
      StoreLock.withLock(spark, store, "task_queue")(throw new RuntimeException("boom"))
    }
    assert(!Files.exists(lockFile), "lock leaked after a failing body")
  }
}
