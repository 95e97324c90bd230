package graft.functions

import java.util.{HashSet => JHashSet}

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the per-document text hot path (builder
  * brief's preference ladder: native Expression with doGenCode > composed
  * builtins > HOFs > UDF).
  *
  * Both expressions exist because their higher-order-function equivalents
  * run interpreted (no codegen, no common-subexpression elimination):
  * round-2 profiling put `corpus_curation` at 24 s driver-side with ~31
  * interpreted `filter(tokens, ...)` walks per document plus a
  * window+distinct shingle pipeline. Each kernel below is one tight JVM
  * loop per row, invoked from inside WholeStageCodegen, with eval()
  * mirroring it for the interpreted path. Semantics are bit-identical to
  * the composed forms (and the DuckDB oracle SQL, which is unchanged):
  * tokenization is `split(text, ' ', -1)` and all digests are lowercase
  * md5 hex, so every value stays hash-checkable.
  */
object TextKernels {

  /** `[n_tokens, hits(set_0), hits(set_1), ...]` in ONE tokenize pass.
    * Matches `size(split(text,' '))` and, per set,
    * `size(filter(split(text,' '), t -> array_contains(set, t)))`. */
  def memberCounts(text: UTF8String, sets: Array[JHashSet[String]]): ArrayData = {
    val s = text.toString
    val out = new Array[Long](sets.length + 1)
    val len = s.length
    var start = 0
    var i = 0
    var n = 0L
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        n += 1
        val tok = s.substring(start, i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(tok)) out(j + 1) += 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    out(0) = n
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingle set of a single-space tokenization —
    * shared by the LSH signature, Jaccard, and repetition kernels;
    * matches `array_distinct(transform(...))` in Dedup.wordShingles.
    * Empty set for docs with fewer than n tokens. */
  private def shingleSetOf(toks: Array[String], n: Int): JHashSet[String] = {
    val shingles = new JHashSet[String](math.max(16, toks.length * 2))
    if (toks.length < n) return shingles
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      shingles.add(sb.toString)
      i += 1
    }
    shingles
  }

  private def shingleSet(text: UTF8String, n: Int): JHashSet[String] =
    shingleSetOf(text.toString.split(" ", -1), n)

  /** Distinct word n-gram shingle ARRAY in FIRST-OCCURRENCE order —
    * the native form of `Dedup.wordShingles` (bit-identical output:
    * same `split(text, ' ', -1)` tokenization with empty tokens kept,
    * same `array_distinct` first-occurrence ordering, empty array for
    * docs with fewer than n tokens). Exists because the composed
    * `array_distinct(transform(sequence(...)))` runs interpreted —
    * one boxed lambda walk per doc per evaluation, which round-16
    * profiling measured at 3-8 s serial stages in every shingle-array
    * consumer (containment, decontamination, pairwise Jaccard). */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return EmptyStringArray
    val seen = new JHashSet[String](math.max(16, toks.length * 2))
    val out = new java.util.ArrayList[AnyRef](toks.length)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** `[total_ngram_occurrences, distinct_ngrams]` in one pass — the
    * within-document repetition signal (Gopher-style duplicate n-gram
    * fraction = 1 − distinct/total). [0, 0] for docs with < n tokens. */
  def shingleStats(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val total = math.max(toks.length - n + 1, 0).toLong
    if (total == 0L) return new GenericArrayData(Array(0L, 0L))
    new GenericArrayData(Array(total, shingleSetOf(toks, n).size.toLong))
  }

  /** Unicode NFC (UAX#15 canonical composition) of one text — the
    * standard pre-tokenization cleanup (combining sequences composed,
    * so 'e'+U+0301 and 'é' hash/tokenize identically). ASCII fast
    * path: NFC is the identity on ASCII, and a crawl corpus is mostly
    * ASCII, so the byte scan avoids the String round-trip per row.
    * Matches DuckDB's nfc_normalize (same UAX#15 algorithm), which is
    * what keeps the oracle bind exact. */
  def nfc(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (text.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) text
    else UTF8String.fromString(java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC))
  }

  /** Word-shingle Jaccard of two texts in one fused pass — the LSH
    * verification scalar. Bit-identical to the composed
    * `size(array_intersect)/size(array_union)` over wordShingles
    * arrays (int counts, one f64 division), which round-4 profiling
    * measured at ~5 s for 3k candidate pairs (two interpreted HOF
    * shingle walks per pair). Returns -1.0 when the union is empty —
    * the expression wrapper maps that to NULL (try_divide semantics;
    * the plain `/` composed form raises DIVIDE_BY_ZERO there under
    * default ANSI mode). */
  def shingleJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) -1.0 else inter.toDouble / union
  }

  /** MinHash-LSH band hashes in one pass: distinct word n-gram shingles →
    * `numHashes` salted-md5 minima → `bands` band digests. Returns an
    * EMPTY array for docs with fewer than n tokens (no n-grams — such
    * docs can never be near-dup candidates; the oracle's NULL band
    * hashes likewise never join). Hash math matches the oracle CTE
    * exactly: min is over lowercase-hex strings (ASCII order == byte
    * order), salt is `"$i:"`, band digest is md5 of the concatenated
    * row hex strings. */
  def minhashBands(text: UTF8String, n: Int, numHashes: Int, bands: Int): ArrayData = {
    val shingles = shingleSet(text, n)
    if (shingles.isEmpty) return TextKernels.EmptyStringArray
    val rowsPerBand = numHashes / bands
    val sb = new java.lang.StringBuilder(64)
    // Min-tracking over RAW digest bytes (unsigned compare == lowercase
    // hex string order), one thread-local MessageDigest, salt prefixes
    // pre-encoded — ~3× cheaper than a DigestUtils call per salted
    // string. Hex encoding happens once per doc, for the band digest
    // input, which the oracle defines over hex strings.
    val md = md5Digest.get()
    val salts = saltBytes(numHashes)
    val mins = new Array[Array[Byte]](numHashes)
    val it = shingles.iterator()
    while (it.hasNext) {
      val sBytes = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = 0
      while (h < numHashes) {
        md.reset()
        md.update(salts(h))
        md.update(sBytes)
        val d = md.digest()
        if (mins(h) == null || unsignedLess(d, mins(h))) mins(h) = d
        h += 1
      }
    }
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        appendHex(sb, mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = UTF8String.fromString(DigestUtils.md5Hex(sb.toString))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Minimum md5 (lowercase hex) over the sliding character k-grams —
    * the native form of TextOps.rollingFingerprint's
    * `array_min(transform(sequence(...), i => md5(substr(i, k))))`.
    * Identical value: positions are CODE POINTS (Spark `substr` and
    * `length` count code points, so the kernel walks UTF-8 start
    * bytes), each window digests the same UTF-8 bytes, and min over
    * lowercase hex strings == unsigned byte-order min over raw
    * digests. Texts shorter than k (including empty — md5 of the empty
    * window) produce exactly one window, matching the composed form's
    * `greatest(length - (k-1), 1)` floor. One thread-local digest and
    * one hex encode per doc instead of an interpreted per-window
    * lambda with a string allocation per hex compare. */
  def rollingMinMd5(text: UTF8String, k: Int): UTF8String = {
    val bytes = text.getBytes
    val n = bytes.length
    val nc = text.numChars()
    val starts = new Array[Int](nc + 1)
    var c = 0
    var i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80 && c < nc) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nc) = n
    val md = md5Digest.get()
    val last = math.max(nc - k, 0)
    var best: Array[Byte] = null
    var s = 0
    while (s <= last) {
      val from = starts(s)
      val until = starts(math.min(s + k, nc))
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      s += 1
    }
    val sb = new java.lang.StringBuilder(32)
    appendHex(sb, best)
    UTF8String.fromString(sb.toString)
  }

  /** The symmetric-delete blocking key set — the native form of
    * Dedup.deletionKeys' `array_union(array(name), transform(...))`:
    * the name itself, then every one-CODE-POINT-deleted variant in
    * deletion-position order, first-occurrence distinct (exactly
    * array_union's ordering). Empty name → [name] (the composed form's
    * `otherwise(empty)` branch unions to the same). */
  def deletionKeys(name: UTF8String): ArrayData = {
    val s = name.toString
    val out = new java.util.LinkedHashSet[String]()
    out.add(s)
    var idx = 0
    while (idx < s.length) {
      val next = s.offsetByCodePoints(idx, 1)
      out.add(s.substring(0, idx) + s.substring(next))
      idx = next
    }
    val arr = new Array[AnyRef](out.size)
    var j = 0
    val it = out.iterator()
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  /** Unigrams followed by adjacent bigrams of the NON-EMPTY tokens —
    * the native form of CorpusOps.gramBuckets' gram stream
    * (`concat(filter(split(text,' '), _ != ''), zip_with(slice, slice,
    * concat))`): same tokenization, same empty-token drop, same order
    * (all unigrams with duplicates, then bigrams of consecutive
    * surviving tokens joined by one space). The composed form runs two
    * interpreted HOF walks per corpus row on DSIR's dominant scan. */
  def wordGrams(text: UTF8String): ArrayData = {
    val toks0 = text.toString.split(" ", -1)
    var nw = 0
    var i = 0
    while (i < toks0.length) { if (!toks0(i).isEmpty) nw += 1; i += 1 }
    if (nw == 0) return EmptyStringArray
    val w = new Array[String](nw)
    var j = 0
    i = 0
    while (i < toks0.length) {
      if (!toks0(i).isEmpty) { w(j) = toks0(i); j += 1 }
      i += 1
    }
    val nb = math.max(nw - 1, 0)
    val out = new Array[AnyRef](nw + nb)
    i = 0
    while (i < nw) { out(i) = UTF8String.fromString(w(i)); i += 1 }
    i = 0
    while (i < nb) {
      out(nw + i) = UTF8String.fromString(w(i) + " " + w(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  val EmptyStringArray: ArrayData = new GenericArrayData(new Array[AnyRef](0))

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `"$i:"` salt prefixes as UTF-8 bytes, cached per hash count. */
  private val saltCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def saltBytes(numHashes: Int): Array[Array[Byte]] =
    saltCache.computeIfAbsent(numHashes, k =>
      Array.tabulate(k)(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val Hex = "0123456789abcdef".toCharArray
  private def appendHex(sb: java.lang.StringBuilder, d: Array[Byte]): Unit = {
    var i = 0
    while (i < d.length) {
      sb.append(Hex((d(i) >> 4) & 0xf)).append(Hex(d(i) & 0xf))
      i += 1
    }
  }
}

/** `graft_token_hits(text, array(array<string>...))` →
  * `array<bigint>` of `[n_tokens, hits_0, hits_1, ...]`. The member
  * lists must be a foldable literal (they parameterize the operator, they
  * don't vary per row). */
case class TokenMemberCounts(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_token_hits"

  @transient private lazy val sets: Array[JHashSet[String]] = {
    require(right.foldable, "graft_token_hits member lists must be a literal")
    val arr = right.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val inner = arr.getArray(i)
      val set = new JHashSet[String]()
      (0 until inner.numElements()).foreach(j => set.add(inner.getUTF8String(j).toString))
      set
    }.toArray
  }

  override protected def nullSafeEval(t: Any, l: Any): Any =
    TextKernels.memberCounts(t.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("memberSets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.TextKernels.memberCounts($t, $setsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenMemberCounts =
    copy(left = newLeft, right = newRight)
}

/** `graft_minhash_bands(text, n, numHashes, bands)` → `array<string>` of
  * the LSH band digests (empty for docs with < n tokens). */
case class MinHashBands(child: Expression, n: Int, numHashes: Int, bands: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.minhashBands(t.asInstanceOf[UTF8String], n, numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.minhashBands($t, $n, $numHashes, $bands);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** `graft_shingle_jaccard(text_a, text_b, n)` → DOUBLE Jaccard of the
  * two texts' distinct word n-gram shingle sets; NULL when both sets
  * are empty (try_divide semantics for the 0/0 case). One fused pass
  * per pair — the codegen'd LSH verification scalar. */
case class ShingleJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def prettyName: String = "graft_shingle_jaccard"

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val j = TextKernels.shingleJaccard(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
    if (j < 0) null else j
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.TextKernels.shingleJaccard($a, $b, $n);
         |if (${ev.value} < 0) { ${ev.isNull} = true; ${ev.value} = 0.0; }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleJaccard =
    copy(left = newLeft, right = newRight)
}

object ShingleJaccard {
  private[functions] def fromArgs(args: Seq[Expression]): ShingleJaccard = {
    require(args.length == 3, s"graft_shingle_jaccard expects 3 args, got ${args.length}")
    args(2) match {
      case Literal(v: Int, IntegerType) => ShingleJaccard(args.head, args(1), v)
      case other => throw new IllegalArgumentException(
        s"graft_shingle_jaccard n must be an int literal, got $other")
    }
  }
}

/** `graft_shingle_stats(text, n)` → `array<bigint>` of
  * [total_ngram_occurrences, distinct_ngrams]. */
case class ShingleStats(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_stats"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.shingleStats(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.shingleStats($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleStats =
    copy(child = newChild)
}

object ShingleStats {
  private[functions] def fromArgs(args: Seq[Expression]): ShingleStats = {
    require(args.length == 2, s"graft_shingle_stats expects 2 args, got ${args.length}")
    args(1) match {
      case Literal(v: Int, IntegerType) => ShingleStats(args.head, v)
      case other => throw new IllegalArgumentException(
        s"graft_shingle_stats n must be an int literal, got $other")
    }
  }
}

/** `graft_word_shingles(text, n)` → `array<string>` of the distinct
  * word n-gram shingles in first-occurrence order (TextKernels
  * .wordShingles — the codegen'd `Dedup.wordShingles`). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.wordShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.wordShingles($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private[functions] def fromArgs(args: Seq[Expression]): WordShingles = {
    require(args.length == 2, s"graft_word_shingles expects 2 args, got ${args.length}")
    args(1) match {
      case Literal(v: Int, IntegerType) => WordShingles(args.head, v)
      case other => throw new IllegalArgumentException(
        s"graft_word_shingles n must be an int literal, got $other")
    }
  }
}

/** `graft_word_grams(text)` → `array<string>` of the non-empty-token
  * unigrams followed by their adjacent bigrams (TextKernels.wordGrams
  * — the codegen'd DSIR gram stream). */
case class WordGrams(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_grams"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.wordGrams(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.wordGrams($t);")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

/** `graft_rolling_fp(text, k)` → the minimum md5 hex over sliding
  * character k-grams (TextKernels.rollingMinMd5 — the codegen'd
  * TextOps.rollingFingerprint). */
case class RollingMinMd5(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_rolling_fp"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.rollingMinMd5(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.rollingMinMd5($t, $k);")

  override protected def withNewChildInternal(newChild: Expression): RollingMinMd5 =
    copy(child = newChild)
}

object RollingMinMd5 {
  private[functions] def fromArgs(args: Seq[Expression]): RollingMinMd5 = {
    require(args.length == 2, s"graft_rolling_fp expects 2 args, got ${args.length}")
    args(1) match {
      case Literal(v: Int, IntegerType) => RollingMinMd5(args.head, v)
      case other => throw new IllegalArgumentException(
        s"graft_rolling_fp k must be an int literal, got $other")
    }
  }
}

/** `graft_deletion_keys(name)` → `array<string>` of the symmetric-
  * delete blocking keys (TextKernels.deletionKeys — the codegen'd
  * Dedup.deletionKeys). */
case class DeletionKeysExpr(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_deletion_keys"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.deletionKeys(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.deletionKeys($t);")

  override protected def withNewChildInternal(newChild: Expression): DeletionKeysExpr =
    copy(child = newChild)
}

/** `graft_nfc(text)` → Unicode NFC normalization (TextKernels.nfc). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.nfc($t);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object MinHashBands {
  /** Registry builder: int params arrive as foldable literals. */
  private[functions] def fromArgs(args: Seq[Expression]): MinHashBands = {
    require(args.length == 4, s"graft_minhash_bands expects 4 args, got ${args.length}")
    def intArg(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"graft_minhash_bands $what must be an int literal, got $other")
    }
    MinHashBands(args.head, intArg(args(1), "n"),
      intArg(args(2), "numHashes"), intArg(args(3), "bands"))
  }
}
