package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash/identity helpers (SURVEY.md §2.3 P3–P5).
  *
  * The reference hashes with SHA-1 (resource.go:27-34, pkg/hash/hash.go).
  * Identity needs only a stable digest, and the DuckDB oracle has sha256
  * but not sha1 — so this engine standardizes on SHA-256. All helpers are
  * pure Column expressions: codegen'd builtins, no UDFs, so they run
  * inside WholeStageCodegen and are usable in any pushdown-friendly plan.
  *
  * Each Column helper has a Scala mirror (used executor-side in the
  * external-process stage and in property tests) that MUST produce the
  * same hex string — HashingSpec asserts the equivalence.
  */
object Hashing {

  /** P3 — resource identity: digest of the URL string (resource.go:27-34). */
  def urlHash(url: Column): Column = sha2(url, 256)

  /** P4 — order-insensitive collated hash (pkg/hash/hash.go:26-40): each
    * member is hashed, member hashes are sorted, concatenated, re-hashed.
    * Collate({a,b}) == Collate({b,a}) by construction.
    */
  def collatedHash(members: Column*): Column =
    sha2(array_join(sort_array(array(members.map(sha2(_, 256)): _*)), ""), 256)

  /** Per-row digest designed for the commutative `bit_xor` AGGREGATE:
    * the low 60 bits of md5(id|payload) as a long. collatedHash's
    * sort-concat form gives a per-ROW order-insensitive identity; this
    * is the GROUP form a corpus manifest needs at 100 TB — xor combines
    * map-side in any order, so a group digest never sorts, collects, or
    * concatenates its members. 15 hex digits keep the value inside a
    * signed long on both engines. DuckDB twin:
    * OracleSnippets.rowDigestSql — edit both together. */
  def rowDigest(id: Column, payload: Column): Column =
    conv(substring(md5(concat(id.cast("string"), lit("|"), payload)), 1, 15), 16, 10)
      .cast("long")

  /** Task identity = collated hash over {input url, output url}
    * (task.go:44-50: Identity() collates InputResource and
    * OutputResource hashes).
    */
  def taskHash(inputUrl: Column, outputUrl: Column): Column =
    collatedHash(inputUrl, outputUrl)

  /** P5 — canonical struct hash. The reference gob-encodes the struct
    * with map fields pre-sorted into (k,v) tuple arrays
    * (hash.go:42-58, core/util.go:6-22); only determinism matters, not
    * the exact bytes. Canonical form here: map entries sorted by key,
    * rendered "k=v" joined by newline (the same shape as the reference's
    * env-string, executor_docker.go:242-251), prefixed by the scalar
    * fields joined by "|".
    */
  def canonicalKv(m: Column): Column =
    array_join(
      sort_array(transform(map_entries(m), e => concat(e("key"), lit("="), e("value")))),
      "\n")

  def strategyHash(executor: Column, config: Column): Column =
    sha2(concat_ws("|", executor, canonicalKv(config)), 256)

  // ── Scala mirrors (executor-side / tests) ─────────────────────────────

  def sha256Hex(s: String): String = sha256HexBytes(s.getBytes("UTF-8"))

  def sha256HexBytes(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(b).map("%02x".format(_)).mkString

  def urlHashStr(url: String): String = sha256Hex(url)

  def collatedHashStr(members: Seq[String]): String =
    sha256Hex(members.map(sha256Hex).sorted.mkString(""))

  def taskHashStr(inputUrl: String, outputUrl: String): String =
    collatedHashStr(Seq(inputUrl, outputUrl))

  /** Sorted in UTF-8 unsigned-byte order — Spark's string comparison —
    * NOT Scala's default UTF-16 code-unit order, which disagrees for
    * supplementary-plane characters. */
  def canonicalKvStr(m: Map[String, String]): String = {
    val byUtf8: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
    }
    m.toSeq.map { case (k, v) => s"$k=$v" }.sorted(byUtf8).mkString("\n")
  }

  def strategyHashStr(executor: String, config: Map[String, String]): String =
    sha256Hex(s"$executor|${canonicalKvStr(config)}")

  /** P7 — env-string split (executor_docker.go:242-251): "A=1\nB=2" →
    * list of assignments; blank lines dropped. */
  def envStrToSeq(envStr: String): Seq[String] =
    envStr.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)

  /** P8 — path → key join (pkg/aws/s3.go:159-162): relativize `path`
    * against `baseDir`, re-root under `basePrefix`. */
  def pathToKey(baseDir: String, basePrefix: String, path: String): String = {
    val rel = java.nio.file.Paths.get(baseDir).relativize(java.nio.file.Paths.get(path))
    (basePrefix.stripSuffix("/") + "/" + rel.toString).stripPrefix("/")
  }

  /** Deterministic 0..n-1 bucket from the first 4 hex digits of
    * md5(string(c)) — the hash primitive behind reproducible splits,
    * shards, and sampling decisions (OracleSnippets.md5BucketSql is the
    * DuckDB mirror). 16 bits of entropy; n should stay well below 2^16,
    * and n not dividing 65536 leaves a ≤0.2% bucket-size bias, which is
    * acceptable for splitting but not for statistics. */
  def md5Bucket(c: Column, n: Int): Column = {
    require(n >= 1 && n <= 65536,
      s"md5Bucket n must be in 1..65536 (4 hex digits = 16 bits of entropy): $n")
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("long") % n
  }
}
