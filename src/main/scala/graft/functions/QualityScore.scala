package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The heuristic quality score as ONE native expression — the per-row
  * kernel of [[graft.ext.TextOps.qualityScore]].
  *
  * The composed form evaluated `tokens(text)` TWICE per row (once for
  * the length-saturation term's size(), once inside the stopword
  * filter — Column subtrees are copied per reference and the
  * higher-order-function chain is outside common-subexpression
  * elimination), plus an interpreted filter+isin pass over every
  * token. This expression takes the ALREADY projected token array and
  * the two cheap codegen'd counts (punctuation regexp count, char
  * length) and computes the identical IEEE double chain in one pass.
  *
  * Arithmetic is replicated operation-for-operation, including the
  * composed form's null funnels (QualityScoreSpec pins bit-equality):
  *   - toks NULL (null text): least(null/50, 1.0) skips the null and
  *     yields 1.0 → term1 = 0.5; the stopword `when` falls to 0.0; the
  *     punctuation `when` falls to 0.0 → term3 = 0.2; total 0.7;
  *   - empty token array: term1 0, term2 0; term3 from punct/chars;
  *   - sum order ((t1·0.5) + (t2·0.3)) + (t3·0.2), double division on
  *     int-cast counts — exactly the old chain, so even the
  *     round(x·10000) consumer sees bit-identical inputs.
  * Never returns null (the composed chain could not either). */
case class QualityScore(first: Expression, second: Expression, third: Expression,
    stopWords: Seq[String]) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"quality_score needs (ARRAY<STRING>, INT, INT), got ($a, $b, $c)")
    }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopWords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** punct/chars arrive as -1 when their source was null (only a null
    * text makes them null, in which case toks is null too). */
  def score(toks: ArrayData, punct: Int, chars: Int): Double = {
    var term1 = 1.0 // least(null/50.0, 1.0) = 1.0 when toks is null
    var term2 = 0.0
    if (toks != null) {
      val n = toks.numElements()
      val nTok = n.toDouble
      term1 = math.min(nTok / 50.0, 1.0)
      if (nTok > 0) {
        var hits = 0
        var i = 0
        while (i < n) {
          if (!toks.isNullAt(i) && stopSet.contains(toks.getUTF8String(i))) hits += 1
          i += 1
        }
        term2 = hits.toDouble / nTok
      }
    }
    val pc = if (chars > 0 && punct >= 0) punct.toDouble / chars.toDouble else 0.0
    val term3 = 1.0 - math.min(pc, 1.0)
    term1 * 0.5 + term2 * 0.3 + term3 * 0.2
  }

  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    val p = second.eval(input)
    val c = third.eval(input)
    score(
      t.asInstanceOf[ArrayData],
      if (p == null) -1 else p.asInstanceOf[Int],
      if (c == null) -1 else c.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = first.genCode(ctx)
    val b = second.genCode(ctx)
    val c = third.genCode(ctx)
    val self = ctx.addReferenceObj("qualityScore", this, classOf[QualityScore].getName)
    val code =
      code"""
        ${a.code}
        ${b.code}
        ${c.code}
        double ${ev.value} = $self.score(
          ${a.isNull} ? null : ${a.value},
          ${b.isNull} ? -1 : ${b.value},
          ${c.isNull} ? -1 : ${c.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): QualityScore =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object QualityScore {
  /** Column-level API: one-pass quality score over a pre-tokenized
    * array plus the punctuation count and char length of the text. */
  def qualityScore(toks: Column, punctCount: Column, chars: Column,
      stopWords: Seq[String]): Column =
    Bridge.column(QualityScore(Bridge.expression(toks),
      Bridge.expression(punctCount), Bridge.expression(chars), stopWords))
}
