package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §5.2 — randomized ingest-filter-dedup invariants, evaluated
  * in one batched Spark pass (per-sample Spark jobs would be minutes):
  * the compiled ext predicate must agree with the straightforward Scala
  * model on a seeded random URL corpus, and dedup must be idempotent. */
class IngestProps extends SparkSpec {

  private val rng = new scala.util.Random(42)
  private val exts = Seq(".mov", ".MOV", ".Mp4", ".txt", "", ".tar.gz", ".movx")
  private val urls: Seq[String] = (0 until 2000).map { i =>
    val depth = rng.nextInt(4)
    val segs = (0 to depth).map(_ => rng.alphanumeric.take(1 + rng.nextInt(8)).mkString)
    s"s3://bucket-${rng.nextInt(3)}/${segs.mkString("/")}${exts(rng.nextInt(exts.length))}"
  }

  test("compiled ext predicate ≡ Scala model over 2000 random URLs") {
    import spark.implicits._
    val df = urls.toDF("url")
    def model(u: String, es: Seq[String]): Boolean =
      es.exists(e => u.toLowerCase.matches(s"^(.+)\\.$e$$"))
    for (spec <- Seq(Seq("mov"), Seq("mov", "mp4"), Seq("gz"))) {
      val got = df.select(col("url"),
          Filters.compile("ext/" + spec.mkString("/"), col("url")).as("m"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      urls.foreach { u =>
        assert(got(u) == model(u, spec), s"mismatch for '$u' spec=$spec")
      }
    }
  }

  test("dedup invariant: count == distinct count after URL dedup, any duplication factor") {
    import spark.implicits._
    val dupes = urls ++ urls.take(500) ++ urls.take(100)
    val deduped = dupes.toDF("url").dropDuplicates("url")
    assert(deduped.count() == urls.distinct.length)
    // idempotent: deduping again changes nothing
    assert(deduped.dropDuplicates("url").count() == deduped.count())
  }
}
