package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding n-CHARACTER window hashes over a string — the gram
  * substrate of the char-level substring family, fused into one
  * native expression. The composed form it replaces
  * (`explode(sequence(0, length-n))` → `substr(txt, pos+1, n)` →
  * `portableHash`) allocates an n-char string AND runs an
  * md5-hex→decimal `conv` round trip per POSITION — the dominant cost
  * of the `substring_char_matches` staging build (~6-8 s at sf0.1,
  * the largest prepare step of round 8). This expression walks the
  * string's UTF-8 bytes ONCE, records each code point's byte offset,
  * and md5s each window's byte slice in place, reading the digest's
  * leading 56 bits directly.
  *
  * Bit-for-bit [[graft.codec.Codecs.portableHash]] over
  * `substr(txt, pos+1, n)` for EVERY input: windows advance by code
  * points (Spark `substr`/`length` semantics — the lead-byte walk
  * below counts exactly what UTF8String.numChars counts), and the
  * md5 input is the window's UTF-8 bytes, which IS the cast-to-binary
  * of the substring. CharWindowHashSpec pins the equality on ASCII,
  * multibyte and supplementary-plane inputs.
  *
  * Returns ARRAY<BIGINT>, one hash per window start (numChars−n+1
  * entries; empty when the string is shorter than n chars); null
  * string → null. Callers posexplode — positions ride as ints, the
  * per-position rows carry longs, never strings. */
case class CharWindowHash(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"char_window_hash needs a positive width, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_window_hash needs STRING, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharWindowHash.hashWindows(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharWindowHash.hashWindows($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharWindowHash =
    copy(child = newChild)
}

object CharWindowHash {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** UTF-8 byte length of a code point from its lead byte — the same
    * classification UTF8String uses to count chars. */
  private def seqLen(b: Byte): Int =
    if (b >= 0) 1
    else if ((b & 0xe0) == 0xc0) 2
    else if ((b & 0xf0) == 0xe0) 3
    else if ((b & 0xf8) == 0xf0) 4
    else 1 // malformed continuation byte: count it alone, like numChars

  def hashWindows(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // one pass: byte offset of each code point (+ the end sentinel);
    // sized by bytes so malformed sequences can never overrun, and
    // clamped so a truncated trailing sequence ends at the sentinel
    val offs = new Array[Int](bytes.length + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      offs(c) = i
      i = math.min(i + seqLen(bytes(i)), bytes.length)
      c += 1
    }
    offs(c) = bytes.length
    val nWin = c - n + 1
    if (nWin <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = md5.get()
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      md.reset()
      md.update(bytes, offs(w), offs(w + n) - offs(w))
      val d = md.digest()
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      out(w) = v
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def charWindowHash(text: Column, n: Int): Column =
    Bridge.column(CharWindowHash(Bridge.expression(text), n))
}
