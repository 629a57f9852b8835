package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Σ aᵢ·bᵢ over two array<double> columns as a native Catalyst
  * expression with codegen — one static call per row. The
  * `aggregate(zip_with(...))` built-in formulation is a higher-order
  * function and therefore interpreted per element; this is the hot
  * kernel of every similarity path (cosine scoring, LSH hyperplane
  * projections, IVF assignment), so it earns a real expression.
  *
  * Summation is left-to-right — bit-identical to the HOF form and to
  * the DuckDB oracle's list_dot_product.
  */
case class DotProduct64Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot64 requires two array<double> arguments, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot64"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct64Expr =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Left-to-right dot product over the common prefix length. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  val FunctionName = "dot64"

  /** Idempotent session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[DotProduct64Expr].getName, FunctionName),
      (children: Seq[Expression]) =>
        DotProduct64Expr(children.head, children(1)))

  /** Column API; the executing session must have [[register]]ed. */
  def dot64(a: Column, b: Column): Column = call_function(FunctionName, a, b)
}
