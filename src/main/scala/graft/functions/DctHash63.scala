package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 63-bit DCT perceptual hash over an 8×8 long grid, fused into one
  * native expression — the imperative form of C = A·X·Aᵀ with the
  * e6-quantized basis [[graft.ext.Multimodal.DctBasisE6]], then the
  * 63 AC coefficients thresholded at their med2 median and packed
  * sign-safe into bits 0..62.
  *
  * Fused for the same reason as [[TextRankFixed]]: the composed
  * HOF chain (px → Y transform → C transform → med2 → bit pack) is
  * CollapseProject-inlined stage-into-lambda, so each downstream
  * iteration re-evaluates the whole upstream transform — measured
  * ~15 min for 500 docs at sf0.01 (three nesting levels multiply to
  * ~10⁹ interpreted evals per document) vs milliseconds fused. The
  * arithmetic here is bit-for-bit the oracle's CTE replay (integer
  * products ≤ ~1.6·10¹⁶, truncation-free; ties 2·c > med2 strict).
  *
  * Input: ARRAY<BIGINT> of exactly 64 grid values (row-major).
  * Returns the packed BIGINT; null array → null. */
case class DctHash63(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dct_hash63 needs ARRAY<BIGINT>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    DctHash63.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DctHash63.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): DctHash63 =
    copy(child = newChild)
}

object DctHash63 {
  private val basis: Array[Long] = graft.ext.Multimodal.DctBasisE6.toArray

  def hash(px: ArrayData): Long = {
    require(px.numElements() == 64,
      s"dct_hash63 needs a 64-element grid, got ${px.numElements()}")
    val x = new Array[Long](64)
    var i = 0
    while (i < 64) {
      // as loud as the 64-element require: getLong on a null slot
      // would silently fold an undefined value into every coefficient
      require(!px.isNullAt(i), s"dct_hash63: null grid element at $i")
      x(i) = px.getLong(i); i += 1
    }
    // Y = A·X
    val y = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var j = 0
      while (j < 8) {
        var s = 0L
        var k = 0
        while (k < 8) { s += basis(u * 8 + k) * x(k * 8 + j); k += 1 }
        y(u * 8 + j) = s
        j += 1
      }
      u += 1
    }
    // C = Y·Aᵀ; collect the 63 AC coefficients (skip u=v=0)
    val ac = new Array[Long](63)
    var t = 0
    var n = 0
    while (t < 64) {
      if (t != 0) {
        val uu = t / 8; val v = t % 8
        var s = 0L
        var j = 0
        while (j < 8) { s += basis(v * 8 + j) * y(uu * 8 + j); j += 1 }
        ac(n) = s
        n += 1
      }
      t += 1
    }
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val med2 = sorted(31) * 2 // n = 63 (odd): both middle ranks are 32 (1-based)
    var h = 0L
    var b = 0
    while (b < 63) {
      if (ac(b) * 2 > med2) h |= 1L << b
      b += 1
    }
    h
  }

  /** Column-level API. */
  def dctHash63(grid: Column): Column =
    Bridge.column(DctHash63(Bridge.expression(grid)))
}
