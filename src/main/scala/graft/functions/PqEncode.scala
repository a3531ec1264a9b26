package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encode: for each of `m` subspaces of `vec`
  * (each `sub` doubles wide), the argmin-squared-L2 codeword index
  * among the first `kCodes` entries of `seeds` — one fused loop with
  * codegen, replacing the composed
  * `transform(sequence, aggregate(sequence, ...))` form, which
  * Catalyst cannot codegen (nested higher-order lambdas run
  * INTERPRETED per row × per codeword × per element — the dominant
  * cost of the PQ corpus encode).
  *
  * Semantics are the composed fold's, bit for bit:
  *  - strict-less replacement starting from (code 0, +MaxValue), so
  *    ties keep the smallest code and an all-NaN/invalid subspace
  *    keeps code 0 — the oracle's NaN-last `ORDER BY d, code` rule;
  *  - slices clip at array ends (like `slice()`); a clipped-length
  *    mismatch between the vector and a codeword, a null codeword, or
  *    a null element makes that candidate's distance null → skipped;
  *  - a null `vec` or null `seeds` nulls every distance, so the
  *    output is code 0 everywhere — never a null array (the composed
  *    `transform` over a literal `sequence` cannot return null).
  * Sole deviation: a `seeds` array shorter than `kCodes` skips the
  * missing candidates, where ANSI `element_at` would raise.
  */
case class PqEncode(left: Expression, right: Expression,
    m: Int, sub: Int, kCodes: Int) extends BinaryExpression {
  require(m > 0 && sub > 0 && kCodes > 0,
    s"pq_encode needs positive m/sub/kCodes, got ($m, $sub, $kCodes)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>), got ($l, $r)")
    }

  override def eval(input: InternalRow): Any = {
    val vAny = left.eval(input)
    val sAny = right.eval(input)
    val v = if (vAny == null) null else vAny.asInstanceOf[ArrayData]
    val seeds = if (sAny == null) null else sAny.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      if (v != null && seeds != null) {
        val start = s * sub
        val aLen = math.max(0, math.min(sub, v.numElements() - start))
        val nSeeds = math.min(kCodes, seeds.numElements())
        var c = 0
        while (c < nSeeds) {
          if (!seeds.isNullAt(c)) {
            val cw = seeds.getArray(c)
            val bLen = math.max(0, math.min(sub, cw.numElements() - start))
            if (aLen == bLen) {
              var d = 0.0d
              var bad = false
              var i = 0
              while (i < aLen && !bad) {
                if (v.isNullAt(start + i) || cw.isNullAt(start + i)) bad = true
                else {
                  val t = v.getDouble(start + i) - cw.getDouble(start + i)
                  d += t * t
                }
                i += 1
              }
              if (!bad && d < bestD) { best = c; bestD = d }
            }
          }
          c += 1
        }
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val ad = classOf[ArrayData].getName
    val v = ctx.freshName("pqVec")
    val sd = ctx.freshName("pqSeeds")
    val codes = ctx.freshName("pqCodes")
    val s = ctx.freshName("pqS")
    val best = ctx.freshName("pqBest")
    val bestD = ctx.freshName("pqBestD")
    val start = ctx.freshName("pqStart")
    val aLen = ctx.freshName("pqALen")
    val nSeeds = ctx.freshName("pqNSeeds")
    val c = ctx.freshName("pqC")
    val cw = ctx.freshName("pqCw")
    val bLen = ctx.freshName("pqBLen")
    val d = ctx.freshName("pqD")
    val bad = ctx.freshName("pqBad")
    val i = ctx.freshName("pqI")
    val t = ctx.freshName("pqT")
    // same loop structure and accumulation order as eval() above
    val code =
      code"""
      ${lg.code}
      ${rg.code}
      $ad $v = ${lg.isNull} ? null : ${lg.value};
      $ad $sd = ${rg.isNull} ? null : ${rg.value};
      int[] $codes = new int[$m];
      for (int $s = 0; $s < $m; $s++) {
        int $best = 0;
        double $bestD = Double.MAX_VALUE;
        if ($v != null && $sd != null) {
          int $start = $s * $sub;
          int $aLen = Math.max(0, Math.min($sub, $v.numElements() - $start));
          int $nSeeds = Math.min($kCodes, $sd.numElements());
          for (int $c = 0; $c < $nSeeds; $c++) {
            if ($sd.isNullAt($c)) continue;
            $ad $cw = $sd.getArray($c);
            int $bLen = Math.max(0, Math.min($sub, $cw.numElements() - $start));
            if ($aLen != $bLen) continue;
            double $d = 0.0;
            boolean $bad = false;
            for (int $i = 0; $i < $aLen; $i++) {
              if ($v.isNullAt($start + $i) || $cw.isNullAt($start + $i)) { $bad = true; break; }
              double $t = $v.getDouble($start + $i) - $cw.getDouble($start + $i);
              $d += $t * $t;
            }
            if (!$bad && $d < $bestD) { $best = $c; $bestD = $d; }
          }
        }
        $codes[$s] = $best;
      }
      ${CodeGenerator.javaType(dataType)} ${ev.value} =
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** Column-level API: fused codegen'd PQ encode. */
  def pqEncode(vec: Column, seeds: Column, m: Int, sub: Int, kCodes: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), Bridge.expression(seeds), m, sub, kCodes))
}
