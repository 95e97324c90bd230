package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Filter registry + compiler (SURVEY.md §2.2).
  *
  * The reference parses a CLI filter spec `"<name>/<arg1>/<arg2>..."`
  * into a per-record FilterFunc via a registry
  * (internal/ingest/util.go:21-24,52-61). Here a spec compiles to a
  * Catalyst Column predicate, so the filter is part of the declarative
  * plan — it pushes into the scan instead of running record-at-a-time.
  *
  * F1 ext filter semantics (util.go:26-44): the regex `^(.+)\.<ext>$` is
  * matched against the LOWERCASED full URL — so extensions match
  * case-insensitively, and a multi-arg spec `ext/mov/mp4` matches any of
  * the listed extensions.
  */
object Filters {

  /** F5 — a key is a "prefix" iff it ends in '/' (pkg/aws/s3.go:359-362). */
  def isPrefix(key: Column): Column = key.endsWith("/")

  /** F1 — extension predicate over the url column. */
  def extPredicate(url: Column, exts: Seq[String]): Column = {
    require(exts.nonEmpty, "ext filter needs at least one extension")
    exts.map(e => lower(url).rlike("^(.+)\\." + java.util.regex.Pattern.quote(e.toLowerCase) + "$"))
      .reduce(_ || _)
  }

  /** F2 — identity predicate (util.go:46-50). */
  def identityPredicate: Column = lit(true)

  /** F3 — registry dispatch: `"ext/mov/mp4"` | `"identity"` → predicate.
    * Unknown names fail fast (the reference errors the ingest request,
    * util.go:57-59). */
  def compile(spec: String, url: Column): Column = {
    val parts = spec.split("/").toSeq
    parts.head match {
      case "identity" => identityPredicate
      case "ext" => extPredicate(url, parts.tail)
      case other => throw new IllegalArgumentException(
        s"unknown filter '$other' (registry: identity, ext)")
    }
  }
}
