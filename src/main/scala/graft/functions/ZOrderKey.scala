package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Z-order (Morton) key of two long dimensions, as a native Catalyst
  * expression with codegen — the sort key behind multi-dimensional
  * data clustering: rows sorted by the interleaved key stay close in
  * BOTH dimensions, so parquet row-group min/max stats stay narrow on
  * both columns and a point/range filter on EITHER dimension skips
  * most of the data. (The same layout trick Delta/Iceberg `OPTIMIZE
  * ZORDER BY` applies; here as a plain expression + write helper.)
  *
  * Bit semantics: the low 32 bits of each input are interleaved
  * (dim a on even bit positions, dim b on odd). Inputs are expected
  * non-negative and < 2^32 AFTER the caller's normalization —
  * [[graft.sql.Layout.zorderWrite]] min/max-scales arbitrary domains
  * into exactly that range first (linear, so a heavily skewed
  * dimension degrades block balance — see that method's doc for the
  * quantile-cut upgrade path).
  */
case class ZOrderKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key requires (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderKey.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKeyExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Morton-interleave the low 32 bits of a (even positions) and b
    * (odd positions). Bit spreading via the standard mask sequence —
    * branch-free, 12 ops per operand, fine inside codegen.
    */
  def interleave(a: Long, b: Long): Long =
    spread(a & 0xffffffffL) | (spread(b & 0xffffffffL) << 1)

  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  val FunctionName = "zorder_key"

  /** Idempotent session registration (the [[SimHash64.register]]
    * convention).
    */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(FunctionName)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[ZOrderKeyExpr].getName, FunctionName),
        (children: Seq[Expression]) => {
          // surfaced as an analysis-time error: unchecked indexing dies
          // with IndexOutOfBoundsException on a wrong-arity SQL call
          require(children.size == 2,
            s"$FunctionName requires exactly 2 arguments, got ${children.size}")
          ZOrderKeyExpr(children(0), children(1))
        })
  }

  /** Column API: requires [[register]] on the executing session. */
  def zorderKey(a: Column, b: Column): Column = call_function(FunctionName, a, b)
}
