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
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary with an explicit undercount
  * certificate (Misra & Gries 1982; merge rule per Agarwal et al. 2013,
  * "Mergeable summaries"). Bounded state: at most `capacity` counters
  * plus two longs, no matter how many distinct items the stream holds —
  * the 100 TB swap for a vocabulary-sized exact groupBy, whose hash
  * state grows with the distinct-token count.
  *
  * The certificate is the point: `offset` accumulates every count
  * decrement a purge has applied, so at any moment
  *   - tracked item:   est ≤ true ≤ est + offset
  *   - untracked item: true ≤ offset
  * Both survive merge (entrywise add, offsets add) and purge (subtract
  * the median counter from everyone, drop non-positives, add the median
  * to offset). Any item with true count ≥ T > offset therefore MUST be
  * tracked with est + offset ≥ T — the candidate set has no false
  * negatives, which is what lets an exact verify pass turn sketch
  * output into a provably exact heavy-hitter answer (the q65 bloom
  * pattern: sketch prunes, exact join decides, results are
  * sketch-independent).
  */
final class MgSummary(val capacity: Int) {
  require(capacity >= 8, s"capacity=$capacity too small to be useful")

  val counts = new java.util.HashMap[String, Long](capacity * 2)
  /** Max undercount any item (tracked or not) may have suffered. */
  var offset: Long = 0L
  /** Exact stream length — updates count reliably even through purges. */
  var n: Long = 0L

  private def addWeight(w: String, c: Long): Unit =
    // absent key: Scala's BoxesRunTime.unboxToLong(null) is 0L, so
    // `get` on a missing entry reads as zero — no containsKey probe
    counts.put(w, counts.get(w) + c)

  def update(w: String): Unit = {
    n += 1
    addWeight(w, 1L)
    if (counts.size > capacity) purge()
  }

  /** Subtract the median counter from every entry, drop non-positives.
    * Removes ≥ half the entries (everything at or below the median), so
    * the amortized cost per stream item is O(1); each purge adds
    * exactly its subtraction to `offset`, keeping the certificate
    * tight rather than a-priori.
    */
  private def purge(): Unit = {
    val vals = new Array[Long](counts.size)
    val it0 = counts.values.iterator()
    var i = 0
    while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val med = math.max(1L, vals(vals.length / 2))
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - med
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
    offset += med
  }

  def mergeIn(o: MgSummary): Unit = {
    n += o.n
    offset += o.offset
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      addWeight(e.getKey, e.getValue)
    }
    while (counts.size > capacity) purge()
  }
}

/** `freq_tokens(w, capacity, frac)` — grouped heavy-hitter CANDIDATES
  * from one bounded-memory pass: a [[MgSummary]] per group, evaluated
  * to a struct of
  *   - `n`   : exact group stream length (the summary counts it),
  *   - `thr` : the absolute threshold max(1, ceil(frac·n)),
  *   - `cand`: all tokens whose true count COULD reach `thr`
  *             (est + offset ≥ thr), sorted for deterministic order.
  *
  * The candidate list may hold false positives (an exact verify join
  * removes them) but provably no false negatives while offset < thr —
  * if purging ever erodes the certificate past the threshold the
  * aggregate fails LOUDLY with the capacity to raise, because a
  * silently incomplete heavy-hitter answer is wrong, not approximate.
  *
  * Catalyst integration: a [[TypedImperativeAggregate]] (the
  * ApproximatePercentile pattern) — the summary object lives in the
  * ObjectHashAggregate buffer, serialized only at shuffle boundaries,
  * with map-side partial aggregation and lossless-within-certificate
  * merge. State per group is O(capacity) regardless of vocabulary.
  */
case class FreqTokensAgg(
    child: Expression,
    capacityExpr: Expression,
    fracExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] {

  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Int]
  private lazy val frac: Double = fracExpr.eval().asInstanceOf[Double]

  override def checkInputDataTypes(): TypeCheckResult = {
    // manual check (the SimHash64Expr convention): Spark 4 keeps
    // AbstractDataType/ImplicitCastInputTypes package-private to sql
    if (child.dataType != StringType ||
        capacityExpr.dataType != IntegerType || fracExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, double), got " +
          children.map(_.dataType.catalogString).mkString("(", ", ", ")"))
    else if (!capacityExpr.foldable || !fracExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName capacity and frac must be literals")
    else if (capacityExpr.eval() == null || fracExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName capacity/frac must not be null")
    else if (capacityExpr.eval().asInstanceOf[Int] < 8)
      TypeCheckResult.TypeCheckFailure(s"$prettyName capacity must be >= 8")
    else {
      val f = fracExpr.eval().asInstanceOf[Double]
      if (f <= 0.0 || f >= 1.0)
        TypeCheckResult.TypeCheckFailure(s"$prettyName frac must be in (0, 1)")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("thr", LongType, nullable = false),
    StructField("cand", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = FreqTokens.FunctionName

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgSummary, other: MgSummary): MgSummary = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MgSummary): Any = {
    val thr = math.max(1L, math.ceil(frac * buffer.n).toLong)
    if (buffer.offset >= thr)
      // the certificate no longer covers the threshold: untracked items
      // could hold true counts ≥ thr. Failing loudly names the fix.
      throw new IllegalStateException(
        s"$prettyName certificate exhausted: undercount bound ${buffer.offset} >= " +
          s"threshold $thr (n=${buffer.n}). Raise capacity above $capacity or frac above $frac.")
    val cand = new java.util.ArrayList[String](64)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue + buffer.offset >= thr) cand.add(e.getKey)
    }
    val arr = cand.toArray(new Array[String](cand.size()))
    java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[String]())
    new GenericInternalRow(Array[Any](
      buffer.n, thr,
      new GenericArrayData(arr.map(UTF8String.fromString(_)))))
  }

  override def serialize(buffer: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // format-version marker: a batch shuffle always pairs identical builds, but
    // persisted state (a streaming checkpoint holding this buffer)
    // could meet a build with a different wire format — mis-decoding
    // length-prefixed bytes as the old writeUTF layout would corrupt
    // silently; a version mismatch must fail loudly instead.
    out.writeByte(FreqTokensAgg.SerFormatVersion)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.n)
    out.writeLong(buffer.offset)
    out.writeInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps a
      // token at 65535 encoded bytes and throws past it — a pathological
      // unbroken run in a document must degrade to a long token, not
      // crash the aggregate at the shuffle boundary
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ver = in.readByte()
    if (ver != FreqTokensAgg.SerFormatVersion)
      throw new IllegalStateException(
        s"$prettyName buffer format version $ver != expected " +
          s"${FreqTokensAgg.SerFormatVersion} — state from an incompatible " +
          "build (e.g. a stale streaming checkpoint); rebuild the state.")
    val s = new MgSummary(in.readInt())
    s.n = in.readLong()
    s.offset = in.readLong()
    var k = in.readInt()
    while (k > 0) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val w = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      s.counts.put(w, in.readLong())
      k -= 1
    }
    s
  }

  override def children: Seq[Expression] = Seq(child, capacityExpr, fracExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqTokensAgg =
    copy(child = newChildren(0), capacityExpr = newChildren(1), fracExpr = newChildren(2))
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqTokensAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqTokensAgg =
    copy(inputAggBufferOffset = newOffset)
}

object FreqTokensAgg {
  /** Aggregation-buffer wire format version ([[FreqTokensAgg.serialize]]).
    * v2 = length-prefixed raw UTF-8 keys (v1 was writeUTF).
    */
  val SerFormatVersion: Byte = 2
}

object FreqTokens {

  val FunctionName = "freq_tokens"

  /** Idempotent session registration (the [[SimHash64.register]]
    * convention).
    */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(FunctionName)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[FreqTokensAgg].getName, FunctionName),
        (children: Seq[Expression]) => {
          require(children.size == 3,
            s"$FunctionName requires exactly 3 arguments (token, capacity, frac), " +
              s"got ${children.size}")
          FreqTokensAgg(children(0), children(1), children(2))
        })
  }

  /** Column API: requires [[register]] on the executing session. */
  def freqTokens(w: Column, capacity: Int, frac: Double): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(FunctionName, w, lit(capacity), lit(frac))
  }
}
