package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Common-prefix length of two strings in CODE POINTS — the LCP
  * kernel of the char-level substring family.
  *
  * The char-level suffix frame used to carry each capped suffix TWICE:
  * as the sort-key string AND as an `array<string>` of its code points,
  * because the only codegen-friendly LCP available compositionally is
  * `array_position(zip_with(a, b, equality), false)` over exploded
  * char arrays. An 80-char suffix as an array is ~80 UTF8String
  * elements plus offsets — roughly an order of magnitude more bytes
  * through the bucketed suffix sort (one Exchange + two window sorts)
  * than the 80-byte string it duplicates. With a native code-point LCP
  * the array column disappears from the frame entirely; the sort moves
  * only (doc_id, pos, h, sfx_str).
  *
  * Semantics match `lcpTokens` over the per-code-point split arrays
  * exactly: count of equal leading code points, never exceeding the
  * shorter input; null if either side is null (BinaryExpression's
  * default null intolerance). Byte-wise: the longest common byte
  * prefix of two valid UTF-8 strings always ends at a code-point
  * boundary-or-mismatch, so counting the code points fully contained
  * in it is exact — a code point straddling the mismatch byte differs
  * on that byte and is correctly excluded. */
case class CommonPrefixLen(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"common_prefix_len needs two STRING arguments, got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    CommonPrefixLen.prefixLen(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CommonPrefixLen.prefixLen($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  /** UTF-8 sequence length from the lead byte — same classification as
    * [[CharWindowHash]] (and UTF8String.numChars). */
  private def seqLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xe0) == 0xc0) 2
    else if ((b & 0xf0) == 0xe0) 3
    else if ((b & 0xf8) == 0xf0) 4
    else 1

  def prefixLen(a: UTF8String, b: UTF8String): Long = {
    val ab = a.getBytes
    val bb = b.getBytes
    val m = math.min(ab.length, bb.length)
    var k = 0
    while (k < m && ab(k) == bb(k)) k += 1
    // count code points whose whole sequence sits inside the common
    // k-byte prefix; a sequence crossing k differs at byte k (or ends)
    var i = 0
    var c = 0L
    while (i < k) {
      val l = seqLen(ab(i))
      if (i + l > k) return c
      i += l
      c += 1
    }
    c
  }

  /** Column-level API: codegen'd code-point LCP. */
  def commonPrefixLen(a: Column, b: Column): Column =
    Bridge.column(CommonPrefixLen(Bridge.expression(a), Bridge.expression(b)))
}
