package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded top-k buffer over (score, id) pairs, ordered (score desc,
  * id asc) — primitive arrays, no boxing, at most k slots. */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** Bounded insertion; O(1) reject against the current worst (the
    * overwhelmingly common case once the buffer is warm). With
    * `distinct`, an exact (score, id) duplicate already held is
    * skipped — the caller's candidate stream may repeat pairs. */
  def insert(s: Double, i: Long, distinct: Boolean): Unit = {
    // fast path: buffer full and (s, i) not strictly better than worst
    if (n >= k && !(s > scores(n - 1) || (s == scores(n - 1) && i < ids(n - 1))))
      return
    // first slot NOT strictly better than (s, i)
    var pos = 0
    while (pos < n && (scores(pos) > s || (scores(pos) == s && ids(pos) < i)))
      pos += 1
    // not-better both ways == equal: the duplicate case
    if (distinct && pos < n && scores(pos) == s && ids(pos) == i) return
    val newN = math.min(n + 1, k)
    var j = newN - 1
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = s
    ids(pos) = i
    n = newN
  }

  def mergeFrom(o: TopKBuf, distinct: Boolean): Unit = {
    var j = 0
    while (j < o.n) { insert(o.scores(j), o.ids(j), distinct); j += 1 }
  }
}

/** Native top-k aggregate over (score, id) pairs — the
  * [[TypedImperativeAggregate]] form of [[TopKAggregator]], with
  * identical `row_number() over (order by score desc, id asc) <= k`
  * semantics (a parity golden asserts ≡).
  *
  * Why it exists: the typed-`Aggregator` UDAF pays an encoder
  * round-trip (tuple deserialization + `Seq` buffer materialization)
  * on EVERY input row — measured ~6 µs/row, ~1.7 s of the q_ann_ivf
  * wall time at sf0.1 over a 2M-row candidate stream. This operator
  * holds two primitive arrays of length k per group and its update
  * path is an O(1) bounded reject / O(k) insert with zero allocation —
  * the per-row cost drops to pointer arithmetic. Still map-side
  * combinable: partials carry ≤ k pairs per group per partition, so
  * the shuffle never sees the pair stream.
  *
  * `distinct = true` additionally skips exact (score, id) duplicates
  * inside the buffer, letting a multi-table LSH candidate stream skip
  * its pair-`dropDuplicates` shuffle entirely (see
  * [[graft.ops.Similarity.qAnnIvf]]).
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
                     distinct: Boolean,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] {

  require(k >= 1)

  override def children: Seq[Expression] = score :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long], distinct)
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    buf.mergeFrom(other, distinct); buf
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData((0 until buf.n).map { j =>
      new GenericInternalRow(Array[Any](buf.scores(j), buf.ids(j)))
    }.toArray[Any])

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var j = 0
    while (j < n) { buf.scores(j) = bb.getDouble; buf.ids(j) = bb.getLong; j += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKFunctions {

  /** Registers `graft_topk(score, id, k, distinct)` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => {
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an int literal, got $other")
        }
        val distinct = exprs(3) match {
          case Literal(v: Boolean, BooleanType) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk distinct must be a boolean literal, got $other")
        }
        TopKPairs(exprs(0), exprs(1), k, distinct)
      },
      "built-in")

  /** Top-k (score, id) pairs per group as array<struct<score,id>>. */
  def topk(score: Column, id: Column, k: Int, distinct: Boolean): Column =
    call_function("graft_topk", score, id, lit(k), lit(distinct))
}
