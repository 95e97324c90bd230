package graft.store

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** The content-keyed staging contract (round-5 review): a staged copy
  * must be invalidated by IN-PLACE source regeneration — a path-keyed
  * stage silently serves stale data to every consumer (streams would
  * verify against the wrong corpus) — and superseded versions must be
  * pruned so tmp holds one live copy per source. */
class StagingSpec extends SparkSpec {

  test("contentKeyed: reuses while source is unchanged, re-stages and prunes after regeneration") {
    val srcDir = Files.createTempDirectory("graft_stage_src")
    Files.write(srcDir.resolve("part-0"), "original".getBytes)
    val stageRoot = Files.createTempDirectory("graft_stage_root").toString
    var writes = 0
    def stage(): String =
      Staging.contentKeyed(spark, srcDir.toString, stageRoot, salt = "t") { tmp =>
        writes += 1
        Files.createDirectories(Paths.get(tmp))
        Files.write(Paths.get(tmp, "data"), s"v$writes".getBytes)
        ()
      }

    val s1 = stage()
    val s1again = stage()
    assert(s1 == s1again && writes == 1, "unchanged source must reuse the staged copy")
    assert(new String(Files.readAllBytes(Paths.get(s1, "data"))) == "v1")

    // regenerate the source IN PLACE (different length → new fingerprint)
    Files.write(srcDir.resolve("part-0"), "regenerated-with-new-length".getBytes)
    val s2 = stage()
    assert(s2 != s1 && writes == 2, "regenerated source must produce a fresh stage")
    assert(new String(Files.readAllBytes(Paths.get(s2, "data"))) == "v2")
    assert(!Files.exists(Paths.get(s1)), "superseded stage version must be pruned")

    // the salt separates consumers staging different DERIVATIONS of one source
    val other = Staging.contentKeyed(spark, srcDir.toString, stageRoot, salt = "u") { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.write(Paths.get(tmp, "data"), "other".getBytes)
      ()
    }
    assert(other != s2, "different salts must not share a stage")
    assert(Files.exists(Paths.get(s2)),
      "a different salt's publish must not prune this salt's live stage " +
        "(salts get separate parents; pruning supersedes same-salt versions only)")
  }
}
