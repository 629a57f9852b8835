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

/** Bounded top-k buffer over (score, id) pairs: a worst-at-root binary
  * heap in two parallel primitive arrays — O(k) memory per group no
  * matter how many rows stream through, O(log k) per accepted row, O(1)
  * per rejected row (one compare against the current worst).
  *
  * Ordering matches Spark SQL's sort semantics for the equivalent
  * `row_number().over(partitionBy(g).orderBy(score [asc|desc], id))`
  * window: doubles compare via `java.lang.Double.compare` (NaN greater
  * than every value, as Spark orders), -0.0 is normalized to 0.0 on
  * insert (Spark's comparison treats them equal), and score ties break
  * by id ascending. Null scores/ids are SKIPPED by the aggregate (the
  * window form would rank nulls first/last) — callers feed non-null
  * scores by construction.
  */
final class TopKHeap(val k: Int, val asc: Boolean) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  var size: Int = 0

  /** Strict total order: is (s1,i1) worse (ranked later) than (s2,i2)? */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) { if (asc) c > 0 else c < 0 } else i1 > i2
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = ts; ids(p) = ti
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
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(m); ids(i) = ids(m)
      scores(m) = ts; ids(m) = ti
      i = m
    }
  }

  def insert(score0: Double, id: Long): Unit = {
    val score = if (score0 == 0.0) 0.0 else score0 // fold -0.0 into 0.0
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  def mergeIn(o: TopKHeap): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }

  /** Entries best-first (deterministic: strict total order, ids unique). */
  def sortedEntries(): Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]],
      new java.util.Comparator[AnyRef] {
        def compare(a: AnyRef, b: AnyRef): Int = {
          val x = a.asInstanceOf[(Double, Long)]
          val y = b.asInstanceOf[(Double, Long)]
          if (worse(x._1, x._2, y._1, y._2)) 1
          else if (worse(y._1, y._2, x._1, x._2)) -1
          else 0
        }
      })
    out
  }

  def writeTo(out: DataOutputStream): Unit = {
    // format-version marker (the FreqTokens convention): persisted
    // state from an incompatible build must fail loudly, not mis-decode
    out.writeByte(TopKAgg.SerFormatVersion)
    out.writeInt(size)
    var i = 0
    while (i < size) {
      out.writeDouble(scores(i)); out.writeLong(ids(i)); i += 1
    }
  }
}

/** `topk_by(score, id, k, asc)` — grouped bounded top-k as an aggregate:
  * the k best (score, id) pairs per group as a best-first-sorted
  * array<struct<score double, id bigint>>.
  *
  * This is the scale replacement for the global
  * `row_number().over(partitionBy(g).orderBy(...)) <= k` window on ANN
  * scoring paths ([[graft.similarity.Similarity.bruteForceTopK]],
  * [[graft.similarity.BinaryAnn.hammingTopK]]): a window must shuffle
  * EVERY scored row to its group's reducer before ranking — N corpus
  * ids per query — while a [[TypedImperativeAggregate]] gets map-side
  * partial combine for free, so each input split ships at most one
  * k-entry buffer per group and the shuffle carries O(k · splits) rows
  * per group instead of O(N). Same pattern as Spark's own
  * ApproximatePercentile; state is two primitive arrays of length k.
  */
case class TopKByAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    ascExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val asc: Boolean = ascExpr.eval().asInstanceOf[Boolean]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType || id.dataType != LongType ||
        kExpr.dataType != IntegerType || ascExpr.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint, int, boolean), got " +
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
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = TopKAgg.FunctionName

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, asc)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedEntries().map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buffer.writeTo(out)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ver = in.readByte()
    if (ver != TopKAgg.SerFormatVersion)
      throw new IllegalStateException(
        s"$prettyName buffer format version $ver != expected " +
          s"${TopKAgg.SerFormatVersion} — state from an incompatible build")
    val h = new TopKHeap(k, asc)
    var n = in.readInt()
    while (n > 0) { h.insert(in.readDouble(), in.readLong()); n -= 1 }
    h
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr, ascExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(score = newChildren(0), id = newChildren(1),
      kExpr = newChildren(2), ascExpr = newChildren(3))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
}

object TopKAgg {

  val FunctionName = "topk_by"

  /** Aggregation-buffer wire format version ([[TopKHeap.writeTo]]). */
  val SerFormatVersion: Byte = 1

  /** Idempotent session registration (the [[FreqTokens.register]]
    * convention).
    */
  def register(spark: SparkSession): Unit = {
    val fid = FunctionIdentifier(FunctionName)
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid,
        new ExpressionInfo(classOf[TopKByAgg].getName, FunctionName),
        (children: Seq[Expression]) => {
          require(children.size == 4,
            s"$FunctionName requires exactly 4 arguments (score, id, k, asc), " +
              s"got ${children.size}")
          TopKByAgg(children(0), children(1), children(2), children(3))
        })
  }

  /** Column API: requires [[register]] on the executing session.
    * `asc = true` ranks smallest score best (distances); `asc = false`
    * ranks largest best (similarities). Ties break by id ascending.
    */
  def topkBy(score: Column, id: Column, k: Int, asc: Boolean): Column =
    call_function(FunctionName, score, id, lit(k), lit(asc))
}
