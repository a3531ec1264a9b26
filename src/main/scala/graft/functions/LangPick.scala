package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The stopword-argmax language pick as ONE native expression — the
  * per-row kernel of [[graft.ext.TextOps.langId]].
  *
  * The composed form it replaces evaluated `tokens(text)` FOUR times
  * per row (one copy of the whole trim/lower/split/filter subtree per
  * language's `size(filter(toks, isin(...)))` — Column arguments are
  * copied as subtrees per reference, and the higher-order-function
  * chain runs interpreted, outside common-subexpression elimination),
  * then scanned the token array four more times with ~7 string
  * comparisons per token each. This expression takes the ALREADY
  * projected token array plus the CJK regexp count and does one pass:
  * per token, one hash lookup into the stop-list bitmask, then the
  * fixed-precedence argmax. The caller tokenizes ONCE.
  *
  * Semantics are bit-identical to the when-chain it replaces
  * (LangPickSpec pins equality against the composed form):
  *   - cjkCount > 0 → "zh" (null cjkCount is not > 0);
  *   - otherwise the first language in `stop` order whose hit count is
  *     >= every LATER language's count ("en" >= all, else "es" >= the
  *     rest, ...), last language as the fallthrough;
  *   - a NULL token array leaves every count comparison null, so the
  *     old chain fell through to the LAST language — reproduced here;
  *   - null array elements match no stop list (isin(null) is null, so
  *     the old filter dropped them). Never returns null. */
case class LangPick(left: Expression, right: Expression,
    stop: Seq[(String, Seq[String])]) extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lang_pick needs (ARRAY<STRING>, INT), got ($l, $r)")
    }

  // token -> bitmask of stop lists containing it (a token may sit in
  // several lists; each list counts it, exactly like the old 4 filters)
  @transient private lazy val mask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    stop.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) (1 << i) else (prev | (1 << i)))
      }
    }
    m
  }
  @transient private lazy val langs: Array[UTF8String] =
    stop.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val zh: UTF8String = UTF8String.fromString("zh")

  /** The whole pick, with the old chain's null funnels folded in. */
  def pick(toks: ArrayData, cjkPositive: Boolean): UTF8String = {
    if (cjkPositive) return zh
    val n = langs.length
    if (toks == null) return langs(n - 1) // null counts fall through the chain
    val counts = new Array[Int](n)
    var i = 0
    val ne = toks.numElements()
    while (i < ne) {
      if (!toks.isNullAt(i)) {
        val m = mask.get(toks.getUTF8String(i))
        if (m != null) {
          var b = m.intValue()
          var j = 0
          while (b != 0) {
            if ((b & 1) != 0) counts(j) += 1
            b >>>= 1; j += 1
          }
        }
      }
      i += 1
    }
    var best = n - 1
    var done = false
    var c = 0
    while (!done && c < n - 1) {
      var ge = true
      var j = c + 1
      while (ge && j < n) { ge = counts(c) >= counts(j); j += 1 }
      if (ge) { best = c; done = true }
      c += 1
    }
    langs(best)
  }

  override def eval(input: InternalRow): Any = {
    val r = right.eval(input)
    val cjkPos = r != null && r.asInstanceOf[Int] > 0
    if (cjkPos) pick(null, cjkPositive = true)
    else pick(left.eval(input).asInstanceOf[ArrayData], cjkPositive = false)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val self = ctx.addReferenceObj("langPick", this, classOf[LangPick].getName)
    val code =
      code"""
        ${l.code}
        ${r.code}
        UTF8String ${ev.value} = $self.pick(
          ${l.isNull} ? null : ${l.value},
          !${r.isNull} && ${r.value} > 0);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LangPick =
    copy(left = newLeft, right = newRight)
}

object LangPick {
  /** Column-level API: one-pass stopword-argmax language id over a
    * pre-tokenized array and a CJK codepoint count. */
  def langPick(toks: Column, cjkCount: Column,
      stop: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangPick(Bridge.expression(toks), Bridge.expression(cjkCount), stop))
}
