package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise fixed-point vector sum as ONE aggregate: each element
  * of an ARRAY&lt;DOUBLE&gt; column is scaled to micro-units, rounded
  * HALF_UP exactly like Spark's `round()` on doubles, and summed as a
  * long — the exact (order- and partition-independent) sum the k-means
  * codebook is built on.
  *
  * Why custom (SURVEY.md §7.3 preference (b)): the composed form —
  * `dims` separate `sum(round(element_at(v,i)*scale).cast("long"))`
  * DeclarativeAggregates — is correct but generates a HashAggregate
  * class ~dims wide; at dims=64 (× two Lloyd rounds, × partial+final
  * stages) Janino compile dominated the whole k-means query (measured:
  * s_ann_ivf_km cold ≈ 7 s at sf0.1 with the wide form — data time
  * was 0.6 s warm). One imperative aggregate keeps a primitive
  * Array[Long] buffer, supports partial aggregation (merge =
  * elementwise add; the shuffle carries dims longs per group either
  * way), and needs no generated code. Values are IDENTICAL
  * (VectorSumFixedSpec pins equality), so the DuckDB oracle SQL —
  * `sum(CAST(round(v[i]*scale) AS BIGINT))` — is unchanged.
  *
  * Rounding contract: Spark's `Round` on a double computes
  * `BigDecimal.valueOf(x).setScale(0, HALF_UP)`; the update path below
  * makes the same library call so ties (x.5 micro-units) break
  * identically. Null elements are skipped per element, like sum() over
  * a null operand; a null array contributes nothing.
  */
case class VectorSumFixed(
    child: Expression,
    dims: Int,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dims)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dims, arr.numElements())
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          buf(i) += java.math.BigDecimal.valueOf(arr.getDouble(i) * scale)
            .setScale(0, java.math.RoundingMode.HALF_UP)
            .doubleValue().toLong
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dims) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(dims * 8)
    var i = 0
    while (i < dims) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dims)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): VectorSumFixed =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumFixed =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumFixed =
    copy(child = c.head)
}

object VectorSumFixed {
  /** Column API: fixed-point elementwise sum of an ARRAY&lt;DOUBLE&gt;. */
  def vecSumFixed(v: Column, dims: Int, scale: Double): Column =
    Bridge.column(VectorSumFixed(Bridge.expression(v), dims, scale).toAggregateExpression())
}
