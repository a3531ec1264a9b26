package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Decode a 4-byte big-endian binary value into a signed Int — the wire
  * encoding Kafka's IntegerSerializer uses for the reference's record
  * values (reference: src/main/resources/application.yml:20-21, consumed
  * via IntegerDeserializer at src/test/java/com/github/timtebeek/TestConsumer.java:28).
  *
  * Spark has no binary→int cast; the composable fallback
  * `conv(hex(value),16,10)` round-trips through strings and breaks on
  * negative values under ANSI casts. A native expression with codegen
  * keeps the decode inside whole-stage codegen (SURVEY.md §7.3: the one
  * custom-Expression candidate). Returns null for inputs that are not
  * exactly 4 bytes (malformed records should not kill a 100 TB scan).
  */
case class BigEndianInt32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"BigEndianInt32 needs BINARY input, got ${child.dataType}")
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length != 4) null
    else ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Keep the emitted Java trivially parseable for Janino: local var +
    // explicit int promotions (inline `(b[i] & 0xff) << n` chains trip
    // Janino's cast/expression disambiguation).
    nullSafeCodeGen(ctx, ev, b => {
      // fresh names: with a non-nullable child the emitted block is not
      // brace-scoped, so two instances in one stage would collide
      val bb = ctx.freshName("beBytes")
      val (b0, b1, b2, b3) =
        (ctx.freshName("be0"), ctx.freshName("be1"), ctx.freshName("be2"), ctx.freshName("be3"))
      s"""
      byte[] $bb = $b;
      if ($bb.length != 4) {
        ${ev.isNull} = true;
      } else {
        int $b0 = $bb[0] & 0xff;
        int $b1 = $bb[1] & 0xff;
        int $b2 = $bb[2] & 0xff;
        int $b3 = $bb[3] & 0xff;
        ${ev.value} = ($b0 << 24) | ($b1 << 16) | ($b2 << 8) | $b3;
      }"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BigEndianInt32 =
    copy(child = newChild)
}

object BigEndianInt32 {
  /** Column-level API: decode Kafka big-endian int payloads. */
  def beInt(c: Column): Column =
    Bridge.column(BigEndianInt32(Bridge.expression(c)))

  /** The inverse: encode an Int column as 4-byte big-endian binary, for
    * writing back to a Kafka sink with the reference's serde. Composed
    * from built-ins (unhex of zero-padded hex) — encode is cold path. */
  def beIntEncode(c: Column): Column = {
    import org.apache.spark.sql.functions._
    unhex(lpad(hex(c.cast("long").bitwiseAND(lit(0xffffffffL))), 8, "0"))
  }
}
