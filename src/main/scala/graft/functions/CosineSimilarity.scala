package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the hot scalar of the similarity-search
  * family (builder brief's preference ladder: native Expression with
  * doGenCode > composed HOFs > UDF).
  *
  * The composed `zip_with`+`aggregate` form is semantically identical
  * but runs interpreted (higher-order functions have no codegen), with
  * a lambda dispatch per element. This expression generates a fused
  * primitive loop — one pass, three accumulators, no allocation — that
  * lives inside WholeStageCodegen, and `eval` mirrors it for the
  * interpreted path. The function builder casts both arguments to
  * array<double> (AbstractDataType/ImplicitCastInputTypes are
  * private[sql] in Spark 4), so callers pass float `embedding` columns
  * directly.
  *
  * Results are bit-identical to the composed form for equal-length
  * arrays of non-null elements (every embedding fixture row): both
  * accumulate left-to-right in f64, which is what keeps the DuckDB
  * oracle's value-level hash compare green. Edge semantics
  * deliberately follow the fused-loop shape instead of the composed
  * form's: zero-norm vectors yield NaN (not a null/error from `/`),
  * unequal lengths truncate to the shorter side (not zip_with's null
  * padding), and null ELEMENTS are read as raw doubles — CosineSimilaritySpec
  * pins the NaN/null-input behavior.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Fused sign-LSH bucketing: all `tables × planes` hyperplane dot
  * products of one vector in a single primitive loop. The hyperplanes
  * are the same deterministic sha256-parity literals as
  * graft.sim.Similarity.hyperplane (component j of plane p in table t =
  * +1 iff the first hex digit of sha256("t:p:j") is odd), cached per
  * (tables, planes, dim). The composed HOF form (one interpreted
  * aggregate+zip_with dot per plane — 40 walks/row at the defaults) is
  * kept in Similarity as the reference form; SimilaritySpec pins the
  * equivalence. Dots accumulate left-to-right in f64, matching both the
  * HOF fold and the DuckDB oracle's list_sum. */
object SimKernels {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planesFor(tables: Int, planes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((tables, planes, dim), { _ =>
      val out = new Array[Array[Double]](tables * planes)
      var t = 0
      while (t < tables) {
        var p = 0
        while (p < planes) {
          out(t * planes + p) = Array.tabulate(dim) { j =>
            val h = graft.core.Hashing.sha256Hex(s"$t:$p:$j")
            if ((Integer.parseInt(h.substring(0, 1), 16) & 1) == 1) 1.0 else -1.0
          }
          p += 1
        }
        t += 1
      }
      out
    })

  def lshBuckets(vec: ArrayData, tables: Int, planes: Int, dim: Int): ArrayData = {
    val hp = planesFor(tables, planes, dim)
    val n = math.min(dim, vec.numElements()) // zip_with truncation semantics
    val out = new Array[AnyRef](tables)
    val sb = new java.lang.StringBuilder(planes)
    var t = 0
    while (t < tables) {
      sb.setLength(0)
      var p = 0
      while (p < planes) {
        val h = hp(t * planes + p)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += vec.getDouble(j) * h(j); j += 1 }
        sb.append(if (dot >= 0) '1' else '0')
        p += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_lsh_buckets(vec, tables, planes, dim)` → `array<string>` of
  * one sign-bit bucket id per table. */
case class LshBuckets(child: Expression, tables: Int, planes: Int, dim: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_lsh_buckets"

  override protected def nullSafeEval(v: Any): Any =
    SimKernels.lshBuckets(v.asInstanceOf[ArrayData], tables, planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SimKernels.lshBuckets($v, $tables, $planes, $dim);")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  private[functions] def fromArgs(args: Seq[Expression]): LshBuckets = {
    require(args.length == 4, s"graft_lsh_buckets expects 4 args, got ${args.length}")
    def intArg(e: Expression, what: String): Int = e match {
      case Literal(v: Int, t) if t == org.apache.spark.sql.types.IntegerType => v
      case other => throw new IllegalArgumentException(
        s"graft_lsh_buckets $what must be an int literal, got $other")
    }
    LshBuckets(Cast(args.head, ArrayType(DoubleType)),
      intArg(args(1), "tables"), intArg(args(2), "planes"), intArg(args(3), "dim"))
  }
}

/** Registration: both the SparkSessionExtensions hook (for
  * `spark.sql.extensions=graft.functions.GraftExtensions`) and an
  * idempotent per-session registrar for sessions built without it. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectTableFunction(LogTableFunction.descriptor)
    ext.injectTableFunction(LogTableFunction.changesDescriptor)
    // catalog reads (`SELECT … FROM graft.t`) upgrade to the native v1
    // relation — file pruning + vectorized scan; see GraftV2ReadRule
    ext.injectResolutionRule(graft.store.GraftV2ReadRule.apply)
    // catalog DML (`UPDATE/MERGE/DELETE graft.t …`) executes through
    // the commit-log machinery; see GraftDmlRule
    ext.injectResolutionRule(graft.store.GraftDmlRule.apply)
    // unfiltered COUNT/MIN/MAX over a logged snapshot answers from
    // log-carried stats with zero file I/O; see GraftStatsAggRule
    ext.injectOptimizerRule(graft.store.GraftStatsAggRule.apply)
    // maintenance verbs Spark's grammar lacks (OPTIMIZE/VACUUM/
    // RESTORE/DESCRIBE HISTORY/SHALLOW CLONE/…) become plain
    // spark.sql statements; the session parser always gets first try
    ext.injectParser { case (_, delegate) =>
      new graft.store.GraftSqlParser(delegate) }
  }
}

object GraftFunctions {

  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"graft_cosine expects 2 args, got ${args.length}")
      val double = ArrayType(DoubleType)
      CosineSimilarity(Cast(args.head, double), Cast(args(1), double))
    })

  val tokenHitsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_token_hits"),
    new ExpressionInfo(classOf[TokenMemberCounts].getName, "graft_token_hits"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"graft_token_hits expects 2 args, got ${args.length}")
      TokenMemberCounts(args.head, args(1))
    })

  val minhashBandsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash_bands"),
    new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
    MinHashBands.fromArgs _)

  val shingleJaccardDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_jaccard"),
    new ExpressionInfo(classOf[ShingleJaccard].getName, "graft_shingle_jaccard"),
    ShingleJaccard.fromArgs _)

  val lshBucketsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lsh_buckets"),
    new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
    LshBuckets.fromArgs _)

  val shingleStatsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_stats"),
    new ExpressionInfo(classOf[ShingleStats].getName, "graft_shingle_stats"),
    ShingleStats.fromArgs _)

  val wordShinglesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
    WordShingles.fromArgs _)

  val wordGramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_word_grams"),
    new ExpressionInfo(classOf[WordGrams].getName, "graft_word_grams"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"graft_word_grams expects 1 arg, got ${args.length}")
      WordGrams(args.head)
    })

  val rollingFpDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_fp"),
    new ExpressionInfo(classOf[RollingMinMd5].getName, "graft_rolling_fp"),
    RollingMinMd5.fromArgs _)

  val deletionKeysDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_deletion_keys"),
    new ExpressionInfo(classOf[DeletionKeysExpr].getName, "graft_deletion_keys"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"graft_deletion_keys expects 1 arg, got ${args.length}")
      DeletionKeysExpr(args.head)
    })

  val nfcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"graft_nfc expects 1 arg, got ${args.length}")
      NfcNormalize(args.head)
    })

  // ── graft_hll_* : the deterministic-HLL scalar pieces (see
  // operators/Hll.scala) exposed to raw SQL. These are COMPOSED column
  // expressions, not hand-written kernels, so the SQL surface is
  // bit-identical to the DataFrame path by construction: the builder
  // re-uses the Hll column builders and unwraps them via ColumnBridge.
  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, t) if t == org.apache.spark.sql.types.IntegerType => v
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an int literal, got $other")
  }

  private def exprDescriptor(name: String, nArgs: Int)(
      build: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(GraftFunctions.getClass.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == nArgs, s"$name expects $nArgs args, got ${args.length}")
      build(args)
    })

  val hllBucketDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    exprDescriptor("graft_hll_bucket", 2)(args =>
      graft.operators.Hll.Exprs.bucket(args.head,
        intLit(args(1), "graft_hll_bucket", "b")))

  val hllRhoDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    exprDescriptor("graft_hll_rho", 2)(args =>
      graft.operators.Hll.Exprs.rhoOf(args.head,
        intLit(args(1), "graft_hll_rho", "b")))

  val hllEstDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    exprDescriptor("graft_hll_est", 3)(args =>
      graft.operators.Hll.Exprs.est(args.head, args(1),
        intLit(args(2), "graft_hll_est", "b")))

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(cosineDescriptor, tokenHitsDescriptor, minhashBandsDescriptor,
      shingleJaccardDescriptor, lshBucketsDescriptor, shingleStatsDescriptor,
      wordShinglesDescriptor, rollingFpDescriptor, deletionKeysDescriptor,
      wordGramsDescriptor,
      nfcDescriptor, hllBucketDescriptor, hllRhoDescriptor, hllEstDescriptor,
      PqExpressions.encodeDescriptor, PqExpressions.adcDescriptor)

  /** Idempotent registration into an existing session — scalar kernels
    * plus the `graft_log` table-valued function (SQL time travel). */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Seq(LogTableFunction.descriptor, LogTableFunction.changesDescriptor)
      .foreach { case (id, info, builder) =>
        spark.sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
      }
  }

  /** Column forms; require register(spark) first. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  def tokenHits(text: Column, lists: Seq[Seq[String]]): Column =
    call_function("graft_token_hits", text,
      org.apache.spark.sql.functions.typedlit(lists))

  def minhashBands(text: Column, n: Int, numHashes: Int, bands: Int): Column =
    call_function("graft_minhash_bands", text,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(numHashes),
      org.apache.spark.sql.functions.lit(bands))

  def shingleJaccard(a: Column, b: Column, n: Int): Column =
    call_function("graft_shingle_jaccard", a, b,
      org.apache.spark.sql.functions.lit(n))

  def lshBuckets(vec: Column, tables: Int, planes: Int, dim: Int): Column =
    call_function("graft_lsh_buckets", vec,
      org.apache.spark.sql.functions.lit(tables),
      org.apache.spark.sql.functions.lit(planes),
      org.apache.spark.sql.functions.lit(dim))

  def wordShingles(text: Column, n: Int): Column =
    call_function("graft_word_shingles", text,
      org.apache.spark.sql.functions.lit(n))

  def wordGrams(text: Column): Column =
    call_function("graft_word_grams", text)

  def rollingFp(text: Column, k: Int): Column =
    call_function("graft_rolling_fp", text,
      org.apache.spark.sql.functions.lit(k))

  def deletionKeys(name: Column): Column =
    call_function("graft_deletion_keys", name)

  def shingleStats(text: Column, n: Int): Column =
    call_function("graft_shingle_stats", text,
      org.apache.spark.sql.functions.lit(n))

  def nfc(text: Column): Column = call_function("graft_nfc", text)

  def pqEncode(vec: Column, codebook: Seq[Seq[Double]], m: Int): Column =
    call_function("graft_pq_encode", vec,
      org.apache.spark.sql.functions.typedLit(codebook),
      org.apache.spark.sql.functions.lit(m))

  def pqAdc(queryVec: Column, codes: Column, codebook: Seq[Seq[Double]],
      m: Int): Column =
    call_function("graft_pq_adc", queryVec, codes,
      org.apache.spark.sql.functions.typedLit(codebook),
      org.apache.spark.sql.functions.lit(m))
}
