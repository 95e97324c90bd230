package graft.ingest

import graft.SparkSpec
import graft.store.Store
import org.apache.spark.sql.functions._

/** SURVEY §5.1/§5.4: filter regex corners, recursion bounds, dedup
  * idempotence — over the FIXTURES.md §2 tree. */
class IngestSpec extends SparkSpec {

  private def keys(filterSpec: String, depth: Int): Set[String] = {
    FixtureTree.ensure()
    Ingest.scan(spark, FixtureTree.root, filterSpec, depth)
      .select("key").collect().map(_.getString(0)).toSet
  }

  test("ext filter matches case-insensitively on the full URL (util.go:39)") {
    assert(keys("ext/mov", 4) == Set(
      "video/a.MOV", "video/b.mov", "video/deep/d.mov", "video/deep/deeper/e.mov"))
  }

  test("multi-ext spec matches any listed extension") {
    assert(keys("ext/mov/mp4", 4) == Set(
      "video/a.MOV", "video/b.mov", "video/c.mp4",
      "video/deep/d.mov", "video/deep/deeper/e.mov"))
  }

  test("no-extension and wrong-extension files never match ext filter") {
    assert(!keys("ext/mov", 4).exists(k => k.endsWith("noext") || k.endsWith(".txt")))
    assert(keys("ext/txt", 4) == Set("docs/readme.txt"))
  }

  test("recursion depth bounds the scan (s3.go:317-321 semantics)") {
    assert(keys("identity", 1) == Set.empty) // root has only directories
    assert(keys("identity", 2) == Set(
      "video/a.MOV", "video/b.mov", "video/c.mp4", "video/noext", "docs/readme.txt"))
    assert(keys("identity", 3).contains("video/deep/d.mov"))
    assert(!keys("identity", 3).contains("video/deep/deeper/e.mov"))
    assert(keys("identity", 4).size == 7)
  }

  test("unknown filter name fails fast (util.go:57-59)") {
    val e = intercept[IllegalArgumentException](keys("bogus/x", 2))
    assert(e.getMessage.contains("bogus"))
  }

  test("re-ingest is idempotent; index carries hash column (D1/A1/K9)") {
    FixtureTree.ensure()
    val store = Store("/tmp/graft_test_state/ingest")
    Store.delete(spark, store.resourceIndex)
    val n1 = Ingest.run(spark, FixtureTree.root, "ext/mov", 4, store)
    val n2 = Ingest.run(spark, FixtureTree.root, "ext/mov", 4, store)
    assert(n1 == 4 && n2 == 4)
    val idx = spark.read.parquet(store.resourceIndex)
    assert(idx.count() == 4)
    // hash column is the sha256 of the url — spot-check one row
    val row = idx.filter(col("key") === "video/b.mov")
      .select("url", "hash").head()
    assert(row.getString(1) == graft.core.Hashing.urlHashStr(row.getString(0)))
  }

  test("Ingest.run leaves no new persistent RDDs behind (listing caches released)") {
    FixtureTree.ensure()
    val store = Store("/tmp/graft_test_state/ingest_nopersist")
    Store.delete(spark, store.resourceIndex)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Ingest.run(spark, FixtureTree.root, "ext/mov", 4, store)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"ingest leaked persistent RDD ids $leaked — per-level listing caches or the checkpoint survived")
  }

  test("ingest with a broader filter later adds only the new files") {
    FixtureTree.ensure()
    val store = Store("/tmp/graft_test_state/ingest_grow")
    Store.delete(spark, store.resourceIndex)
    assert(Ingest.run(spark, FixtureTree.root, "ext/mov", 4, store) == 4)
    assert(Ingest.run(spark, FixtureTree.root, "identity", 4, store) == 7)
  }
}
