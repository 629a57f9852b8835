package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
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
  * the DuckDB oracle's list_dot_product — and, like the HOF form,
  * yields NULL for length-mismatched inputs or null elements.
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
  override def nullable: Boolean = true
  override def prettyName: String = "dot64"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotStrict(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VectorOps.dotStrict($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct64Expr =
    copy(left = newLeft, right = newRight)
}

/** Σ Long.bitCount(aᵢ ^ bᵢ) over two array<long> columns — Hamming
  * distance between bit-packed binary codes ([[graft.similarity.BinaryAnn]])
  * as a native codegen'd expression. This is the N×Q hot kernel of
  * binary-quantized ANN (one eval per corpus×query pair), so like
  * [[DotProduct64Expr]] it earns a real expression over the interpreted
  * `aggregate(zip_with(...))` HOF form. NULL on length mismatch or null
  * elements (same strictness rationale as [[VectorOps.dotStrict]]).
  */
case class HammingBitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hamming64 requires two array<bigint> arguments, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming64"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.hammingStrict(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Integer ${ev.value}_r = graft.functions.VectorOps.hammingStrict($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.intValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingBitsExpr =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Left-to-right dot product; NULL (like the aggregate/zip_with HOF
    * formulation) when lengths differ or either side has a null
    * element — a truncated or partially-null embedding must drop out
    * of similarity rankings, not score a plausible prefix sum.
    */
  def dotStrict(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Hamming distance over packed bit words; NULL on length mismatch
    * or null elements, mirroring [[dotStrict]].
    */
  def hammingStrict(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }

  val FunctionName = "dot64"
  val HammingName = "hamming64"

  /** Idempotent session registration: a no-op when the function is
    * already registered (re-registering WARNs "replaced a previously
    * registered function" on every call otherwise).
    */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(FunctionName)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[DotProduct64Expr].getName, FunctionName),
        (children: Seq[Expression]) => {
          require(children.size == 2,
            s"dot64 expects exactly 2 arguments, got ${children.size}")
          DotProduct64Expr(children.head, children(1))
        })
    val hid = FunctionIdentifier(HammingName)
    if (!spark.sessionState.functionRegistry.functionExists(hid))
      spark.sessionState.functionRegistry.registerFunction(
        hid,
        new ExpressionInfo(classOf[HammingBitsExpr].getName, HammingName),
        (children: Seq[Expression]) => {
          require(children.size == 2,
            s"hamming64 expects exactly 2 arguments, got ${children.size}")
          HammingBitsExpr(children.head, children(1))
        })
  }

  /** Column API; the executing session must have [[register]]ed. */
  def dot64(a: Column, b: Column): Column = call_function(FunctionName, a, b)

  /** Column API; the executing session must have [[register]]ed. */
  def hamming64(a: Column, b: Column): Column = call_function(HammingName, a, b)
}
