package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** DIFFERENTIAL property test for column mapping: a table that keeps
  * getting RENAMED must behave — at every step, under every row-level
  * operation — exactly like an unmapped control table receiving the
  * same logical operations. A seeded random op sequence (appends,
  * copy-on-write and merge-on-read deletes, updates, merges,
  * optimize, renames) drives both tables; after every step the mapped
  * table's rows (renamed back to the control's names) must equal the
  * control's. This pins the whole translation surface — write-path
  * physical naming, read aliasing, stats/bloom key translation, CDC,
  * DV attachment — against drift that single-op specs can miss. */
class MappingDifferentialSpec extends SparkSpec {
  import spark.implicits._

  test("seeded random op sequence: mapped table ≡ unmapped control at every step") {
    val root = Files.createTempDirectory("graft_mapdiff").toString
    val mapped = s"$root/mapped"
    val control = s"$root/control"
    val rnd = new scala.util.Random(42)

    // original → CURRENT logical name on the mapped table
    var names = Map("id" -> "id", "a" -> "a", "b" -> "b")
    var nextId = 0L
    var renameSeq = 0

    def batch(n: Int): Seq[(Long, Long, String)] = {
      val rows = (nextId until nextId + n).map(i => (i, i * 3, s"v$i"))
      nextId += n
      rows
    }

    def df(rows: Seq[(Long, Long, String)], forMapped: Boolean): DataFrame =
      rows.toDF(
        if (forMapped) names("id") else "id",
        if (forMapped) names("a") else "a",
        if (forMapped) names("b") else "b")

    def schemaOf(t: String) = CommitLog.tableSchema(spark, t)

    def readBack(t: String, asControlNames: Boolean): Set[(Long, Long, String)] = {
      val d = CommitLog.read(spark, t, schemaOf(t))
      val sel =
        if (asControlNames)
          d.select(col(names("id")).as("id"), col(names("a")).as("a"),
            col(names("b")).as("b"))
        else d.select("id", "a", "b")
      sel.as[(Long, Long, String)].collect().toSet
    }

    // bootstrap both tables with a schema ledger
    val seed = batch(30)
    CommitLog.append(df(seed, forMapped = false), control, mergeSchema = true)
    CommitLog.append(df(seed, forMapped = true), mapped, mergeSchema = true)

    (1 to 22).foreach { step =>
      rnd.nextInt(8) match {
        case 0 | 1 => // append a fresh batch
          val rows = batch(10 + rnd.nextInt(10))
          CommitLog.append(df(rows, forMapped = false), control)
          CommitLog.append(df(rows, forMapped = true), mapped)
        case 2 => // copy-on-write delete on the key
          val k = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(k)
          CommitLog.deleteWhere(spark, control, schemaOf(control),
            col("id") % k === r)
          CommitLog.deleteWhere(spark, mapped, schemaOf(mapped),
            col(names("id")) % k === r)
        case 3 => // merge-on-read delete on the renamed payload column
          val cut = rnd.nextInt(nextId.toInt.max(1)).toLong * 3
          CommitLog.deleteWhere(spark, control, schemaOf(control),
            col("a") > lit(cut), deletionVectors = true)
          CommitLog.deleteWhere(spark, mapped, schemaOf(mapped),
            col(names("a")) > lit(cut), deletionVectors = true)
        case 4 => // update through the (possibly renamed) columns
          val k = 2 + rnd.nextInt(4)
          CommitLog.updateWhere(spark, control, schemaOf(control),
            col("id") % k === 0,
            Map("a" -> (col("a") + 1000L),
              "b" -> concat(col("b"), lit("!"))))
          CommitLog.updateWhere(spark, mapped, schemaOf(mapped),
            col(names("id")) % k === 0,
            Map(names("a") -> (col(names("a")) + 1000L),
              names("b") -> concat(col(names("b")), lit("!"))))
        case 5 => // keyed merge: update an id slice + insert fresh rows
          val upd = readBack(control, asControlNames = false).toSeq
            .sortBy(_._1).take(5)
            .map { case (i, a, b) => (i, a + 7, b + "~") }
          val ins = batch(5)
          CommitLog.merge(spark, control, schemaOf(control),
            df(upd ++ ins, forMapped = false), Seq("id"))
          CommitLog.merge(spark, mapped, schemaOf(mapped),
            df(upd ++ ins, forMapped = true), Seq(names("id")))
        case 6 => // maintenance: selective optimize (absorbs any vectors)
          CommitLog.optimize(spark, control, targetBytes = 1L << 20)
          CommitLog.optimize(spark, mapped, targetBytes = 1L << 20)
        case 7 => // rename ANY column — the KEY included — on the
          // MAPPED table only (a merge/delete on a renamed key
          // exercises the key-translation surface specifically)
          val orig = rnd.nextInt(3) match {
            case 0 => "id"; case 1 => "a"; case 2 => "b"
          }
          renameSeq += 1
          val to = s"${orig}_r$renameSeq"
          CommitLog.renameColumn(spark, mapped, names(orig), to)
          names += orig -> to
      }
      val want = readBack(control, asControlNames = false)
      val got = readBack(mapped, asControlNames = true)
      assert(got == want,
        s"step $step diverged (names now $names): " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
    // the sequence must actually have exercised renames
    assert(names.values.toSet != Set("id", "a", "b"),
      "seed produced no renames — change the seed to keep the test honest")
  }
}
