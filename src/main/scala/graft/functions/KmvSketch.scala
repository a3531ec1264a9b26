package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as ONE mergeable
  * imperative aggregate over a LONG hash column: the buffer is the at
  * most k smallest distinct hashes seen, merge is a k-way min-merge —
  * the Bar-Yossef et al. bottom-k estimator, the mergeable-summary
  * shape a 100 TB distinct-count dashboard carries (k longs per
  * group cross the shuffle, never the value set).
  *
  * Deterministic by construction: the k smallest DISTINCT hashes of a
  * multiset do not depend on row order or merge tree, so the emitted
  * sorted array — and any estimator derived from it — is bit-stable
  * and oracle-checkable (the DuckDB mirror is `row_number() OVER
  * (ORDER BY h) <= k` on distinct hashes). Below k distincts the
  * sketch IS the exact value set.
  *
  * Scale/O(): per-row update is a binary search + (on hit) an
  * insertion into a k-array — k is tens, not thousands, so this is
  * cheaper than the distinct-shuffle + rank window it replaces; the
  * [[graft.SparkEntry]] a_daily_distinct row keeps that two-pass
  * exact/estimate comparison form, a_daily_distinct_kmv is this
  * one-pass production form. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buf] {

  override def createAggregationBuffer(): KmvSketch.Buf =
    new KmvSketch.Buf(new Array[Long](k), 0)

  override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: KmvSketch.Buf, other: KmvSketch.Buf): KmvSketch.Buf = {
    var i = 0
    while (i < other.size) { buf.insert(other.vals(i), k); i += 1 }
    buf
  }

  override def eval(buf: KmvSketch.Buf): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.vals, buf.size))

  override def serialize(buf: KmvSketch.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val vals = new Array[Long](k)
    var i = 0
    while (i < n) { vals(i) = bb.getLong(); i += 1 }
    new KmvSketch.Buf(vals, n)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketch =
    copy(child = c.head)
}

object KmvSketch {

  /** Sorted-ascending bottom-k set with distinct-insert. Mutable on
    * purpose (aggregation buffer); `vals(0 until size)` is the sketch. */
  final class Buf(val vals: Array[Long], var size: Int) {
    /** Insert `h` keeping the k smallest DISTINCT values sorted. */
    def insert(h: Long, k: Int): Unit = {
      var idx = java.util.Arrays.binarySearch(vals, 0, size, h)
      if (idx >= 0) return // already present
      idx = -(idx + 1)
      if (idx >= k) return // larger than the current k minima
      val last = math.min(size, k - 1)
      var i = last
      while (i > idx) { vals(i) = vals(i - 1); i -= 1 }
      vals(idx) = h
      if (size < k) size += 1
    }
  }

  /** Column API: sorted array of the k smallest distinct hashes. */
  def kmv(h: Column, k: Int): Column =
    Bridge.column(KmvSketch(Bridge.expression(h), k).toAggregateExpression())

  /** The (k−1)·2^56/h_k estimate off a sketch array column, with the
    * exact-count fallback below k — the shared emission of the batch
    * row and the streaming twin. */
  def estimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(round(lit((k - 1).toDouble) * lit(7.2057594037927936e16) /
        element_at(sketch, k)).cast("long"))
  }
}
