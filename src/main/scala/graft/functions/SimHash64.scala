package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized lowercase text, as a native
  * Catalyst expression with codegen — one static call per row inside
  * whole-stage codegen, no UDF serialization overhead.
  *
  * Algorithm (Charikar 2002, "Similarity estimation techniques from
  * rounding algorithms"): per token, a 64-bit FNV-1a hash votes ±1 on
  * each bit position; the sign vector becomes the fingerprint. Hamming
  * distance between fingerprints estimates cosine similarity of the
  * token multisets — near-duplicate docs land within a few bits.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64 {

  /** FNV-1a 64-bit — stable, dependency-free, fast in codegen. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def hash(text: String): Long = {
    val votes = new Array[Int](64)
    val lower = text.toLowerCase
    var start = 0
    val len = lower.length
    var i = 0
    while (i <= len) {
      if (i == len || Character.isWhitespace(lower.charAt(i))) {
        if (i > start) {
          val h = fnv1a64(lower.substring(start, i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  val FunctionName = "simhash64"

  /** Idempotent session registration: a no-op when the function is
    * already registered (re-registering WARNs "replaced a previously
    * registered function" on every call otherwise).
    */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(FunctionName)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[SimHash64Expr].getName, FunctionName),
        (children: Seq[Expression]) => SimHash64Expr(children.head))
  }

  /** Column API: requires [[register]] to have been called on the
    * session that executes the plan.
    */
  def simhash64(c: Column): Column = call_function(FunctionName, c)
}
