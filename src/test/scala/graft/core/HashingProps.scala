package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** SURVEY §5.2 — property tests for the hashing operators: identity
  * must be stable under member ordering and map insertion order, and
  * different member sets must not collide (the reference relies on the
  * task hash as its dedup key, task.go:44-50). */
object HashingProps extends Properties("Hashing") {

  private val urlGen: Gen[String] = for {
    bucket <- Gen.identifier.suchThat(_.nonEmpty)
    parts <- Gen.listOfN(3, Gen.identifier)
    ext <- Gen.oneOf(".mov", ".MOV", ".mp4", ".txt", "")
  } yield s"s3://$bucket/${parts.mkString("/")}$ext"

  property("collated hash is order-insensitive") =
    forAll(Gen.nonEmptyListOf(urlGen)) { members =>
      val shuffled = scala.util.Random.shuffle(members)
      Hashing.collatedHashStr(members) == Hashing.collatedHashStr(shuffled)
    }

  property("collated hash distinguishes different member multisets") =
    forAll(Gen.nonEmptyListOf(urlGen), urlGen) { (members, extra) =>
      !members.contains(extra) ==>
        (Hashing.collatedHashStr(members) != Hashing.collatedHashStr(extra :: members))
    }

  property("task hash symmetric in input/output") = forAll(urlGen, urlGen) { (a, b) =>
    Hashing.taskHashStr(a, b) == Hashing.taskHashStr(b, a)
  }

  property("strategy hash insensitive to map insertion order") =
    forAll(Gen.mapOf(Gen.zip(Gen.identifier, Gen.identifier)), Gen.identifier) {
      (config, executor) =>
        val reversed = config.toSeq.reverse.foldLeft(Map.empty[String, String])(_ + _)
        Hashing.strategyHashStr(executor, config) ==
          Hashing.strategyHashStr(executor, reversed)
    }

  property("strategy hash sensitive to values") =
    forAll(Gen.identifier.suchThat(_.nonEmpty), Gen.identifier, Gen.identifier) {
      (k, v1, v2) =>
        (v1 != v2) ==> {
          Hashing.strategyHashStr("process", Map(k -> v1)) !=
            Hashing.strategyHashStr("process", Map(k -> v2))
        }
    }

  property("env split drops blanks and keeps assignments in order") =
    forAll(Gen.listOf(Gen.oneOf(Gen.const(""), Gen.const("  "),
      Gen.identifier.map(k => s"$k=v")))) { lines =>
      val out = Hashing.envStrToSeq(lines.mkString("\n"))
      Prop(out.forall(_.contains("=")) &&
        out == lines.map(_.trim).filter(_.nonEmpty))
    }

  property("pathToKey relativizes under the prefix") =
    forAll(Gen.identifier.suchThat(_.nonEmpty), Gen.identifier.suchThat(_.nonEmpty)) {
      (prefix, file) =>
        Hashing.pathToKey("/work/in", prefix, s"/work/in/$file") == s"$prefix/$file"
    }
}
