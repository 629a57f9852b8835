package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native codegen'd probes against driver-built sketches — the scale
  * replacement for the per-row Scala UDF probes on the 100-TB paths
  * (VERDICT r15 #3): a UDF breaks whole-stage codegen and pays a boxed
  * JVM call per row; these expressions deserialize the sketch ONCE per
  * task (transient lazy, from the serialized-literal bytes shipped in
  * the expression tree) and probe it with a static-dispatch call inside
  * the generated code, keeping the surrounding filter/projection in one
  * WholeStageCodegen span.
  *
  * The sketch argument must be a foldable binary literal — a sketch is
  * driver-built by construction (`df.stat.bloomFilter`, the
  * `count_min_sketch` aggregate), and a literal is what lets the same
  * bytes ride codegen references instead of re-evaluating per row.
  */
object SketchProbes {

  val BloomName = "bloom_might_contain"
  val CmsName = "cms_estimate"

  /** Idempotent session registration (the [[VectorOps.register]]
    * convention).
    */
  def register(spark: SparkSession): Unit = {
    val bid = FunctionIdentifier(BloomName)
    if (!spark.sessionState.functionRegistry.functionExists(bid))
      spark.sessionState.functionRegistry.registerFunction(
        bid,
        new ExpressionInfo(classOf[BloomMightContainExpr].getName, BloomName),
        (children: Seq[Expression]) => {
          require(children.size == 2,
            s"$BloomName expects exactly 2 arguments (sketch, hash), got ${children.size}")
          BloomMightContainExpr(children.head, children(1))
        })
    val cid = FunctionIdentifier(CmsName)
    if (!spark.sessionState.functionRegistry.functionExists(cid))
      spark.sessionState.functionRegistry.registerFunction(
        cid,
        new ExpressionInfo(classOf[CmsEstimateExpr].getName, CmsName),
        (children: Seq[Expression]) => {
          require(children.size == 2,
            s"$CmsName expects exactly 2 arguments (sketch, item), got ${children.size}")
          CmsEstimateExpr(children.head, children(1))
        })
  }

  /** `mightContain` over an xxhash64 value. Requires [[register]]. */
  def bloomMightContain(sketch: Array[Byte], hash: Column): Column =
    call_function(BloomName, lit(sketch), hash)

  /** CMS point estimate for a string item; NULL in → NULL out (wrap in
    * `coalesce` for never-counted semantics). Requires [[register]].
    */
  def cmsEstimate(sketch: Array[Byte], item: Column): Column =
    call_function(CmsName, lit(sketch), item)

  /** Serialized form of a built bloom filter, for the literal arg. */
  def bloomBytes(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}

/** `bloom_might_contain(sketchBytes, hash)` — membership probe of a
  * 64-bit hash against a serialized `spark.util.sketch.BloomFilter`.
  * Matches `BloomFilter.mightContainLong` exactly (the same call the
  * replaced UDF made).
  */
case class BloomMightContainExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got " +
          children.map(_.dataType.catalogString).mkString("(", ", ", ")"))
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName sketch must be a literal")
    else if (left.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName sketch must not be null")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = SketchProbes.BloomName

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(left.eval().asInstanceOf[Array[Byte]]))

  def probe(h: Long): Boolean = bloom.mightContainLong(h)

  protected override def nullSafeEval(sketch: Any, h: Any): Any =
    probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, (_, h) => s"${ev.value} = $ref.probe($h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainExpr =
    copy(left = newLeft, right = newRight)
}

/** `cms_estimate(sketchBytes, item)` — point frequency estimate of a
  * string item against a serialized `spark.util.sketch.CountMinSketch`.
  * Matches `CountMinSketch.estimateCount(String)` exactly (the same
  * call the replaced UDF made, and the same byte-level hashing the
  * `count_min_sketch` aggregate applied when building).
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got " +
          children.map(_.dataType.catalogString).mkString("(", ", ", ")"))
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName sketch must be a literal")
    else if (left.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName sketch must not be null")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = SketchProbes.CmsName

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(
      new ByteArrayInputStream(left.eval().asInstanceOf[Array[Byte]]))

  def probe(item: UTF8String): Long = cms.estimateCount(item.toString)

  protected override def nullSafeEval(sketch: Any, item: Any): Any =
    probe(item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this,
      classOf[CmsEstimateExpr].getName)
    nullSafeCodeGen(ctx, ev, (_, item) => s"${ev.value} = $ref.probe($item);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}
