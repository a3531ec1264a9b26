package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The 56-bit oracle-portable md5 prefix as ONE native expression —
  * the scalar core of [[graft.codec.Codecs.portableHash]].
  *
  * The composed form it replaces,
  * `conv(substring(md5(bytes), 1, 14), 16, 10) CAST AS BIGINT`, pays
  * three per-row string round-trips on top of the digest itself:
  * md5() hex-encodes the 16-byte digest into a 32-char UTF8String,
  * substring() allocates a 14-char slice, and conv() re-parses that
  * slice digit-by-digit through NumberConverter into ANOTHER decimal
  * UTF8String, which the final cast parses BACK into a long. The
  * digest's leading 7 bytes big-endian ARE that value — this
  * expression reads them directly (the [[CharWindowHash]] fusion,
  * exposed for single-value call sites instead of sliding windows).
  *
  * Bit-for-bit equal to the conv form for every input: 14 hex chars =
  * the first 7 digest bytes, the value is < 2^56 so the long never
  * overflows and conv's unsigned parse can never wrap.
  * Md5Prefix56Spec pins the equality on representative inputs.
  *
  * Input BINARY (callers keep the `cast(string) → cast(binary)`
  * normalization so cross-type hash inputs render identically on both
  * engines); null → null. */
case class Md5Prefix56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix56 needs BINARY, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix56.hash56(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix56.hash56($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix56 =
    copy(child = newChild)
}

object Md5Prefix56 {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** md5(bytes)'s leading 56 bits as a non-negative long. */
  def hash56(bytes: Array[Byte]): Long = {
    val md = md5.get()
    md.reset()
    md.update(bytes)
    val d = md.digest()
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v
  }

  /** Column-level API: 56-bit md5 prefix of a BINARY column. */
  def md5Prefix56(bytes: Column): Column =
    Bridge.column(Md5Prefix56(Bridge.expression(bytes)))
}
