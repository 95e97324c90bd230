package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The bloom-filter write path's contract: exactly the requested
  * columns carry filters in every footer, point lookups read back
  * identically, and bad inputs fail loudly. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("exactly the requested columns carry bloom filters; lookups match a plain write") {
    val dir = Files.createTempDirectory("graft_bloom").toString + "/t"
    val plainDir = Files.createTempDirectory("graft_bloom_plain").toString + "/t"
    val df = spark.range(0, 10000)
      .select(col("id"),
        sha2(col("id").cast("string"), 256).as("event_id"),
        (col("id") % 5).as("category"))
    Bloom.writeWithBloomFilters(df, dir, Map("event_id" -> 10000L))
    df.write.parquet(plainDir)

    val withBloom = Bloom.bloomColumns(spark, dir)
    assert(withBloom.nonEmpty, "no bloom filters landed in any footer")
    assert(withBloom.map(_._2).toSet == Set("event_id"),
      s"bloom columns != requested: $withBloom")
    assert(Bloom.bloomColumns(spark, plainDir).isEmpty,
      "plain write unexpectedly carries bloom filters")

    // a point lookup through the bloom-filtered table reads identically
    val probe = df.filter(col("id") === 4321).select("event_id").as[String].head()
    val viaBloom = spark.read.parquet(dir).filter(col("event_id") === probe)
    val viaPlain = spark.read.parquet(plainDir).filter(col("event_id") === probe)
    assert(viaBloom.count() == 1 &&
      viaBloom.exceptAll(viaPlain).count() == 0 &&
      viaPlain.exceptAll(viaBloom).count() == 0)
    // the equality predicate reaches the scan either way — the bloom
    // decides per row group whether pages are read at all
    val plan = viaBloom.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_id"),
      s"point predicate not pushed:\n$plan")

    intercept[IllegalArgumentException] {
      Bloom.writeWithBloomFilters(df, dir + "_x", Map("nope" -> 10L))
    }
    intercept[IllegalArgumentException] {
      Bloom.writeWithBloomFilters(df, dir + "_y", Map("event_id" -> 0L))
    }
  }
}
