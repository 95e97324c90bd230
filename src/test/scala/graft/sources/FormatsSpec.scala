package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Corrupt-record quarantine: bad lines must route to the quarantine
  * frame, never fail the read, and never leak into the good rows. */
class FormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("json read quarantines unparseable lines, keeps the rest") {
    val dir = Files.createTempDirectory("graft_quarantine").toString
    Files.write(Paths.get(dir, "data.json"),
      """{"id": 1, "name": "ok"}
        |{"id": "not-a-number", "name": "bad-type"}
        |this is not json at all
        |{"id": 2, "name": "fine"}
        |""".stripMargin.getBytes("UTF-8"))

    val (good, bad) = Formats.readWithQuarantine(spark, "json", schema, dir)
    assert(good.count() == 2)
    assert(good.columns.toSeq == Seq("id", "name"))
    assert(bad.count() == 2)
    val quarantined = bad.collect().map(_.getString(0)).mkString("\n")
    assert(quarantined.contains("not json at all"))
    assert(quarantined.contains("not-a-number"))
  }

  test("csv read quarantines malformed rows") {
    val dir = Files.createTempDirectory("graft_quarantine_csv").toString
    Files.write(Paths.get(dir, "data.csv"),
      """id,name
        |1,ok
        |oops-wrong-type,bad
        |2,fine
        |""".stripMargin.getBytes("UTF-8"))
    val (good, bad) = Formats.readWithQuarantine(
      spark, "csv", schema, dir, Formats.csvOptions)
    assert(good.count() == 2)
    assert(bad.count() == 1)
  }
}
