package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Exact fixed-point Gram matrix (X^T X) of an ARRAY&lt;DOUBLE&gt;
  * embedding column as ONE imperative aggregate — the second-moment
  * input of PCA/whitening over an embedding corpus.
  *
  * Each element is scaled and rounded HALF_UP to a long with the same
  * library call as Spark's `round()` (the [[VectorSumFixed]]
  * contract), then every upper-triangle product f_i·f_j is
  * accumulated into a primitive Array[Long] of d(d+1)/2 cells. Exact
  * integer arithmetic makes the result order- and partition-
  * independent — bit-identical to the DuckDB oracle's
  * `sum(CAST(round(v[i]·s) AS BIGINT) · CAST(round(v[j]·s) AS
  * BIGINT))` — which a float dot-product sum would not be.
  *
  * Scale shape: the d²/2-long buffer lives once per partition
  * (partial aggregation), so 100 TB of vectors reduce to one
  * #partitions × ~16 KB (d=64) shuffle — no per-pair rows ever
  * materialize, unlike the exploded i×j formulation whose shuffle is
  * d²·N. Overflow budget: at scale=1e3 and ‖v‖∞ ≈ 10, products are
  * ≤ 1e8, so ~9·10^10 rows fit a long per cell — raise dims-budget
  * by lowering scale if a corpus exceeds it. Exceeding the budget
  * throws (Math.addExact/multiplyExact), never wraps silently.
  *
  * Output: array of (i, j, gram_fx) structs, i ≤ j, 0-indexed.
  * Null arrays contribute nothing; null elements read as 0 (dense
  * embeddings have none — documented, not load-bearing). */
case class GramMatrixFixed(
    child: Expression,
    dims: Int,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val cells = dims * (dims + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dims, arr.numElements())
      val f = new Array[Long](dims)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          f(i) = java.math.BigDecimal.valueOf(arr.getDouble(i) * scale)
            .setScale(0, java.math.RoundingMode.HALF_UP)
            .doubleValue().toLong
        }
        i += 1
      }
      var k = 0
      i = 0
      while (i < dims) {
        var j = i
        while (j < dims) {
          // exact by contract: exceeding the documented scale/row
          // budget must throw, not wrap silently (intrinsified, no
          // measurable cost over raw +/*)
          buf(k) = Math.addExact(buf(k), Math.multiplyExact(f(i), f(j)))
          k += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < cells) { buf(k) = Math.addExact(buf(k), other(k)); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var k = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        out(k) = new GenericInternalRow(Array[Any](i, j, buf(k)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(cells * 8)
    var k = 0
    while (k < cells) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(cells)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("gram_fx", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): GramMatrixFixed =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixFixed =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GramMatrixFixed =
    copy(child = c.head)
}

object GramMatrixFixed {
  /** Column API: exact fixed-point upper-triangle Gram matrix. */
  def gramFixed(v: Column, dims: Int, scale: Double): Column =
    Bridge.column(GramMatrixFixed(Bridge.expression(v), dims, scale).toAggregateExpression())
}
