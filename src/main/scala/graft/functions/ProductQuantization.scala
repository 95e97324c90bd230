package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** PRODUCT QUANTIZATION kernels — the memory-compression half of a
  * vector index (IVF handles the candidate-set half; PQ shrinks what
  * each candidate costs): a d-dim vector is split into `m` contiguous
  * subspaces and each subspace is replaced by the id of its nearest
  * codebook entry, so a 64-float embedding stores as m small ints and
  * query scoring reads codes, not floats — at 100 TB the difference
  * between an index that fits in executor memory and one that doesn't.
  *
  * Both kernels are native codegen expressions (the repo's preference
  * ladder: fused primitive loops inside WholeStageCodegen, `eval`
  * mirroring for the interpreted path). Distances accumulate
  * left-to-right in f64 — subspace-major, element-minor — which is
  * exactly the accumulation order the DuckDB oracle reproduces with a
  * reconstructed-vector scan, keeping even the f64 scores hash-equal.
  *
  * The codebook rides as a LITERAL `array<array<double>>` child (the
  * first-k-by-id seed, same oracle-replayable convention as the IVF
  * centroids — `Similarity.initialCentroids`); codebook entries are
  * FULL vectors, sliced per subspace inside the loop, so one literal
  * serves every subspace. */
object PqKernels {

  /** `dim / m` in both kernels is INTEGER division, so a dimension not
    * divisible by `m` would silently drop the trailing `dim % m`
    * elements of every vector — wrong codes and scores with no signal.
    * Similarity.pqTopK validates divisibility at the API layer, but
    * the SQL-registered `graft_pq_encode`/`graft_pq_adc` reach these
    * kernels directly, so the kernels fail loudly themselves. */
  private def requireDivisible(dim: Int, m: Int, fn: String): Unit = {
    if (m <= 0 || dim % m != 0)
      throw new IllegalArgumentException(
        s"$fn: vector dimension $dim is not divisible into $m subspaces — " +
          "the trailing elements would be silently ignored; pick m with " +
          "dim % m == 0")
  }

  /** Codebook entries are FULL vectors sliced per subspace; an entry
    * shorter than the vector would read past its end (UnsafeArrayData
    * does not bounds-check), an entry longer would silently ignore its
    * tail. One O(k) pass up front, amortized against the O(k·dim)
    * kernel loop. */
  private def requireCodebook(cb: ArrayData, dim: Int, fn: String): Unit = {
    val k = cb.numElements()
    var c = 0
    while (c < k) {
      val len = cb.getArray(c).numElements()
      if (len != dim)
        throw new IllegalArgumentException(
          s"$fn: codebook entry $c has length $len but vectors have " +
            s"dimension $dim — entries must be full-length vectors")
      c += 1
    }
  }

  /** Per-subspace nearest codebook entry: codes[s] = argmin over c of
    * Σ_{i∈subspace s} (vec[i] − cb[c][i])², strict `<` keeping the
    * LOWEST code on a tie (the window tie-break the oracle uses). */
  def encode(vec: ArrayData, cb: ArrayData, m: Int): ArrayData = {
    val dim = vec.numElements()
    requireDivisible(dim, m, "graft_pq_encode")
    requireCodebook(cb, dim, "graft_pq_encode")
    val sd = dim / m
    val k = cb.numElements()
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val cv = cb.getArray(c)
        var d = 0.0
        var i = s * sd
        val end = i + sd
        while (i < end) {
          val diff = vec.getDouble(i) - cv.getDouble(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Asymmetric distance computation (ADC): squared L2 between the
    * query and the CODES' reconstruction — Σ_s Σ_{i∈s} (q[i] −
    * cb[codes[s]][i])², one pass, no reconstruction materialized. */
  def adc(q: ArrayData, codes: ArrayData, cb: ArrayData, m: Int): Double = {
    val dim = q.numElements()
    requireDivisible(dim, m, "graft_pq_adc")
    val sd = dim / m
    val k = cb.numElements()
    var total = 0.0
    var s = 0
    while (s < m) {
      // validate only the m ACCESSED entries (not the whole k-entry
      // codebook — this is the per-candidate scoring hot path, O(dim)
      // of real work; an O(k) sweep per row would dominate it): the
      // code must index the codebook and the entry must be full-length
      // (UnsafeArrayData does not bounds-check reads)
      val ci = codes.getInt(s)
      if (ci < 0 || ci >= k)
        throw new IllegalArgumentException(
          s"graft_pq_adc: code $ci at subspace $s is outside the " +
            s"$k-entry codebook")
      val cv = cb.getArray(ci)
      if (cv.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_pq_adc: codebook entry $ci has length ${cv.numElements()} " +
            s"but vectors have dimension $dim — entries must be full-length")
      var i = s * sd
      val end = i + sd
      while (i < end) {
        val diff = q.getDouble(i) - cv.getDouble(i)
        total += diff * diff
        i += 1
      }
      s += 1
    }
    total
  }
}

/** `graft_pq_encode(vec, codebook, m)` → `array<int>` of one code per
  * subspace. */
case class PqEncode(left: Expression, right: Expression, m: Int)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(v: Any, cb: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"${ev.value} = graft.functions.PqKernels.encode($v, $cb, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_adc(queryVec, codes, codebook, m)` → double squared-L2
  * ADC score. */
case class PqAdc(first: Expression, second: Expression, third: Expression,
    m: Int) extends TernaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(q: Any, codes: Any, cb: Any): Any =
    PqKernels.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, codes, cb) =>
      s"${ev.value} = graft.functions.PqKernels.adc($q, $codes, $cb, $m);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAdc =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqExpressions {
  private val doubles = ArrayType(ArrayType(DoubleType))

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, t) if t == IntegerType => v
    case other => throw new IllegalArgumentException(
      s"$fn m must be an int literal, got $other")
  }

  val encodeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_pq_encode"),
    new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
    (args: Seq[Expression]) => {
      require(args.length == 3, s"graft_pq_encode expects 3 args, got ${args.length}")
      PqEncode(Cast(args.head, ArrayType(DoubleType)), Cast(args(1), doubles),
        intLit(args(2), "graft_pq_encode"))
    })

  val adcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_pq_adc"),
    new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
    (args: Seq[Expression]) => {
      require(args.length == 4, s"graft_pq_adc expects 4 args, got ${args.length}")
      PqAdc(Cast(args.head, ArrayType(DoubleType)), Cast(args(1), ArrayType(IntegerType)),
        Cast(args(2), doubles), intLit(args(3), "graft_pq_adc"))
    })
}
