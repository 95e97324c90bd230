package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

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

/** Registration: both the SparkSessionExtensions hook (for
  * `spark.sql.extensions=graft.functions.GraftExtensions`) and an
  * idempotent per-session registrar for sessions built without it. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
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

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(cosineDescriptor, tokenHitsDescriptor, minhashBandsDescriptor, shingleJaccardDescriptor)

  /** Idempotent registration into an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
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
}
