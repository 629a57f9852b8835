package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer over (score, key) pairs where the tiebreak key
  * is a STRING — the [[TopKHeap]] shape (worst-at-root binary heap,
  * O(k) state, O(log k) per accepted row) with the id column widened
  * from long to UTF8String.
  *
  * Ordering matches Spark SQL's sort semantics for the equivalent
  * `row_number().over(partitionBy(g).orderBy(score [asc|desc], key))`
  * window: doubles compare via `java.lang.Double.compare` (NaN greater
  * than every value), -0.0 folds into 0.0 on insert, and score ties
  * break by key ascending in UTF8String binary order — Spark's string
  * sort order (unsigned byte-wise, which equals code-point order for
  * UTF-8). Null scores/keys are SKIPPED (callers feed non-null values
  * by construction). Unlike the window form, DUPLICATE (score, key)
  * pairs are admitted as distinct entries — callers feed key-distinct
  * groups (one row per (group, key), e.g. a count or score aggregate),
  * where the two formulations coincide.
  */
final class TopKStrHeap(val k: Int, val asc: Boolean) {
  private val scores = new Array[Double](k)
  private val keys = new Array[UTF8String](k)
  var size: Int = 0

  /** Strict order: is (s1,k1) worse (ranked later) than (s2,k2)?
    * Equal (score, key) pairs are not "worse" — insert keeps the
    * incumbent, matching the window's stable treatment of duplicates
    * only when callers feed distinct keys (documented above).
    */
  private def worse(s1: Double, k1: UTF8String, s2: Double, k2: UTF8String): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) { if (asc) c > 0 else c < 0 } else k1.compareTo(k2) > 0
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), keys(i), scores(p), keys(p))) {
        val ts = scores(i); val tk = keys(i)
        scores(i) = scores(p); keys(i) = keys(p)
        scores(p) = ts; keys(p) = tk
        i = p
      } else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), keys(l), scores(m), keys(m))) m = l
      if (r < size && worse(scores(r), keys(r), scores(m), keys(m))) m = r
      if (m == i) return
      val ts = scores(i); val tk = keys(i)
      scores(i) = scores(m); keys(i) = keys(m)
      scores(m) = ts; keys(m) = tk
      i = m
    }
  }

  def insert(score0: Double, key: UTF8String): Unit = {
    val score = if (score0 == 0.0) 0.0 else score0 // fold -0.0 into 0.0
    if (size < k) {
      scores(size) = score; keys(size) = key; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), keys(0), score, key)) {
      scores(0) = score; keys(0) = key
      siftDown(0)
    }
  }

  def mergeIn(o: TopKStrHeap): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.keys(i)); i += 1 }
  }

  /** Entries best-first (deterministic given distinct keys per group). */
  def sortedEntries(): Array[(Double, UTF8String)] = {
    val out = Array.tabulate(size)(i => (scores(i), keys(i)))
    java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]],
      new java.util.Comparator[AnyRef] {
        def compare(a: AnyRef, b: AnyRef): Int = {
          val x = a.asInstanceOf[(Double, UTF8String)]
          val y = b.asInstanceOf[(Double, UTF8String)]
          if (worse(x._1, x._2, y._1, y._2)) 1
          else if (worse(y._1, y._2, x._1, x._2)) -1
          else 0
        }
      })
    out
  }

  def writeTo(out: DataOutputStream): Unit = {
    out.writeByte(TopKStrAgg.SerFormatVersion)
    out.writeInt(size)
    var i = 0
    while (i < size) {
      out.writeDouble(scores(i))
      val b = keys(i).getBytes
      out.writeInt(b.length)
      out.write(b)
      i += 1
    }
  }
}

/** `topk_by_str(score, key, k, asc)` — grouped bounded top-k with a
  * string tiebreak key: the k best (score, key) pairs per group as a
  * best-first-sorted array<struct<score double, key string>>.
  *
  * The scale replacement for
  * `row_number().over(partitionBy(g).orderBy(score [asc|desc], key)) <= k`
  * windows whose ranked items are STRINGS (terms, n-grams): the window
  * must shuffle and sort a group's ENTIRE vocabulary on one reducer,
  * while this [[TypedImperativeAggregate]] gets map-side partial
  * combine — each input split ships at most one k-entry buffer per
  * group, so a hot group costs O(k · splits) through the exchange
  * instead of its full vocabulary (see q176/q192, and [[TopKByAgg]]
  * for the long-id original).
  */
case class TopKByStrAgg(
    score: Expression,
    key: Expression,
    kExpr: Expression,
    ascExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrHeap] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val asc: Boolean = ascExpr.eval().asInstanceOf[Boolean]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType || key.dataType != StringType ||
        kExpr.dataType != IntegerType || ascExpr.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, string, int, boolean), got " +
          children.map(_.dataType.catalogString).mkString("(", ", ", ")"))
    else if (!kExpr.foldable || !ascExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k and asc must be literals")
    else if (kExpr.eval() == null || ascExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k/asc must not be null")
    else if (kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("key", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = TopKStrAgg.FunctionName

  override def createAggregationBuffer(): TopKStrHeap = new TopKStrHeap(k, asc)

  override def update(buffer: TopKStrHeap, input: InternalRow): TopKStrHeap = {
    val s = score.eval(input)
    val kv = key.eval(input)
    if (s != null && kv != null)
      // clone: the UTF8String points into a reused input row buffer
      buffer.insert(s.asInstanceOf[Double], kv.asInstanceOf[UTF8String].clone())
    buffer
  }

  override def merge(buffer: TopKStrHeap, other: TopKStrHeap): TopKStrHeap = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TopKStrHeap): Any =
    new GenericArrayData(buffer.sortedEntries().map { case (s, kv) =>
      new GenericInternalRow(Array[Any](s, kv))
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKStrHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buffer.writeTo(out)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStrHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ver = in.readByte()
    if (ver != TopKStrAgg.SerFormatVersion)
      throw new IllegalStateException(
        s"$prettyName buffer format version $ver != expected " +
          s"${TopKStrAgg.SerFormatVersion} — state from an incompatible build")
    val h = new TopKStrHeap(k, asc)
    var n = in.readInt()
    while (n > 0) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      h.insert(s, UTF8String.fromBytes(b))
      n -= 1
    }
    h
  }

  override def children: Seq[Expression] = Seq(score, key, kExpr, ascExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByStrAgg =
    copy(score = newChildren(0), key = newChildren(1),
      kExpr = newChildren(2), ascExpr = newChildren(3))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByStrAgg =
    copy(inputAggBufferOffset = newOffset)
}

object TopKStrAgg {

  val FunctionName = "topk_by_str"

  /** Aggregation-buffer wire format version ([[TopKStrHeap.writeTo]]). */
  val SerFormatVersion: Byte = 1

  /** Idempotent session registration (the [[TopKAgg.register]] convention). */
  def register(spark: SparkSession): Unit = {
    val fid = FunctionIdentifier(FunctionName)
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid,
        new ExpressionInfo(classOf[TopKByStrAgg].getName, FunctionName),
        (children: Seq[Expression]) => {
          require(children.size == 4,
            s"$FunctionName requires exactly 4 arguments (score, key, k, asc), " +
              s"got ${children.size}")
          TopKByStrAgg(children(0), children(1), children(2), children(3))
        })
  }

  /** Column API: requires [[register]] on the executing session.
    * `asc = true` ranks smallest score best; `asc = false` largest.
    * Ties break by key ascending (UTF8 binary order). Scores must be
    * exactly representable doubles where ordering matters — integer
    * scores are exact up to 2^53.
    */
  def topkByStr(score: Column, key: Column, k: Int, asc: Boolean): Column =
    call_function(FunctionName, score, key, lit(k), lit(asc))
}
