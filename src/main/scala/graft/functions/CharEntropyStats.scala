package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-string character-code entropy statistics as ONE native pass —
  * the kernel of m_payload_entropy.
  *
  * The composed form it replaces exploded one row per CHARACTER
  * (`explode(sequence(1, length(text)))`) and evaluated
  * `ascii(substring(text, i, 1))` per row: each substring call scans
  * the UTF-8 bytes from the start to locate character i, so a document
  * costs O(len²) byte scans — and the exploded frame then carried
  * corpus×len rows through TWO hash aggregations (a (doc, code)
  * histogram shuffle, then the per-doc rollup). This expression emits
  * the identical statistics in one O(len·log len) row-local pass:
  * decode the code points once, sort, count runs. At corpus scale the
  * explode-shuffle disappears entirely — the query becomes scan-bound.
  *
  * Semantics replicated exactly (CharEntropyStatsSpec pins equality
  * against the composed chain):
  *   - Spark's `ascii(c)` is `codePointAt(0)` of the character (spark
  *     4.1.2 Ascii.nullSafeEval), and `substring(text, i, 1)` is the
  *     i-th CODE POINT — so the histogram keys are code points;
  *   - n_chars = Σ counts = length(text) (code points);
  *   - n_distinct = distinct code points;
  *   - clnc = Σ c·ln(c) with ln = StrictMath.log (what Spark's `ln`
  *     calls). Summation runs in sorted-code-point order; the composed
  *     form's partial-agg order was partition-dependent, and every
  *     consumer rounds at 4 decimals, far above the 1-ulp reorder
  *     noise (the xent_nats convention).
  * Null input → null row (UnaryExpression's default null intolerance);
  * the caller filters empty strings exactly as before. */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("clnc", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats needs STRING, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharEntropyStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

object CharEntropyStats {

  /** (n_chars, n_distinct, Σ c·ln c) over the string's code points. */
  def stats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val len = str.length
    val m = str.codePointCount(0, len)
    val cps = new Array[Int](m)
    var i = 0
    var k = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps)
    var nDistinct = 0L
    var clnc = 0.0
    var j = 0
    while (j < m) {
      var r = j + 1
      while (r < m && cps(r) == cps(j)) r += 1
      val c = (r - j).toDouble
      nDistinct += 1
      clnc += c * StrictMath.log(c)
      j = r
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m.toLong, nDistinct, clnc))
  }

  /** Column-level API. */
  def charEntropyStats(text: Column): Column =
    Bridge.column(CharEntropyStats(Bridge.expression(text)))
}
