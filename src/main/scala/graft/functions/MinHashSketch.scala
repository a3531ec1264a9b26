package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash sketch as ONE aggregate: k permutations
  * h_i(x) = (a_i·x + b_i) mod P folded with elementwise min into a
  * single Array[Long] buffer.
  *
  * Why custom (SURVEY.md §7.3 preference (b)): the composed form —
  * k separate `min(pmod(h*a+b, P))` DeclarativeAggregates — works but
  * generates a very wide HashAggregate class per stage (seconds of
  * Janino compile per query at k=16) and k independent agg buffers.
  * One imperative aggregate keeps the buffer as a primitive long
  * array, supports partial aggregation (merge = elementwise min, so
  * the shuffle still carries exactly k longs per group), and needs no
  * generated code at all. Values are IDENTICAL to the composed form,
  * so the DuckDB oracle SQL is unchanged.
  *
  * Input column must be a non-negative 56-bit hash
  * ([[graft.codec.Codecs.portableHash]]) so a·x+b never overflows a
  * signed 64-bit long (a ≤ 2k+1, x < 2^56).
  */
case class MinHashSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  val P: Long = MinHashSketch.P

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val m = (h * (2L * i + 1) + (10007L * i + 1)) % P
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    // all-null / empty group: the Long.MaxValue sentinel is unreachable
    // as a real minimum (every h_i(x) < P < MaxValue), so it means "no
    // input seen" — return null like the composed min() form would,
    // rather than a plausible-looking degenerate signature
    if (buf(0) == Long.MaxValue) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSketch =
    copy(child = c.head)
}

object MinHashSketch {
  val P: Long = 2305843009213693951L // 2^61 - 1, Mersenne prime

  /** Column API: aggregate a hash column into a k-wide minhash array. */
  def minhashSketch(h: Column, k: Int): Column =
    Bridge.column(MinHashSketch(Bridge.expression(h), k).toAggregateExpression())
}
