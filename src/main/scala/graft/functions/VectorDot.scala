package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns, with codegen.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) => x*y), 0d,
  * (acc,x) => acc+x)` — is semantically right but executes as
  * INTERPRETED higher-order lambdas: Catalyst does not codegen HOFs, so
  * every candidate pair in the ANN family pays per-element closure
  * dispatch plus an intermediate product array. This expression is the
  * same left-to-right fold (bit-identical double sums, so every DuckDB
  * `list_dot_product` oracle is unchanged) as ONE fused loop inside
  * whole-stage codegen.
  *
  * Null contract matches the HOF composition: null if either array is
  * null, if lengths differ (zip_with pads with null), or if any element
  * is null (null poisons the product then the sum).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs two ARRAY<DOUBLE> arguments, got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("vdN")
      val i = ctx.freshName("vdI")
      val s = ctx.freshName("vdSum")
      val bad = ctx.freshName("vdBad")
      // same accumulation order as the interpreted path: index 0..n-1
      s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        int $n = $a.numElements();
        double $s = 0.0;
        boolean $bad = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
      }"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column-level API: fused codegen'd dot product. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))
}

/** Squared L2 distance over two `array<double>` columns — the PQ
  * encode/score kernel, fused for the same reason as [[VectorDot]]
  * (the composed `aggregate(zip_with((x,y) => (x-y)²))` runs as
  * interpreted lambdas). Identical left-to-right accumulation and null
  * contract, so the DuckDB `list_sum(list_transform(...))` oracles are
  * unchanged. */
case class VectorL2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_l2sq needs two ARRAY<DOUBLE> arguments, got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("l2N")
      val i = ctx.freshName("l2I")
      val s = ctx.freshName("l2Sum")
      val d = ctx.freshName("l2D")
      val bad = ctx.freshName("l2Bad")
      s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        int $n = $a.numElements();
        double $s = 0.0;
        boolean $bad = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
          double $d = $a.getDouble($i) - $b.getDouble($i);
          $s += $d * $d;
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
      }"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2Sq =
    copy(left = newLeft, right = newRight)
}

object VectorL2Sq {
  /** Column-level API: fused codegen'd squared L2 distance. */
  def vecL2Sq(a: Column, b: Column): Column =
    Bridge.column(VectorL2Sq(Bridge.expression(a), Bridge.expression(b)))
}
