package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded fixed-point PageRank over ONE document's co-occurrence
  * graph, fused into a native expression — the per-document tail of
  * the TextRank keyword extractor (Mihalcea & Tarau 2004) when the
  * iterate is embarrassingly parallel PER KEY rather than one big
  * graph. The composed form it replaces unrolled
  * `iters × (join + aggregate)` over the corpus-wide (doc_id, src)
  * frame — four data-sized shuffles whose only purpose was to move
  * every document's tiny edge list back together again each round
  * (measured 5.4 s warm at sf0.1; the fused form groups edges per
  * document ONCE and ranks in place, ~2 s). The corpus-level
  * aggregation stays distributed: this expression only ever sees one
  * row's already-grouped edge array, the same per-document batch
  * contract as the media decode path.
  *
  * Bit-for-bit the arithmetic of the unrolled form (and of
  * [[graft.ops.Graph.pageRankFixed]]'s update at its defaults): every
  * vertex starts at `scale`; each round every vertex t receives
  * `c = Σ_{(s→t)} (p_s · w div wout_s)` and is re-ranked
  * `teleport + (dampNum · c) div dampDen`. All longs; both divisions
  * truncate on non-negative operands, so a recursive-CTE oracle (or
  * the unrolled DataFrame form) replays it exactly. Long-sum order
  * inside a round is immaterial (integer addition commutes), so the
  * result is independent of edge order in the array.
  *
  * Input contract: a SYMMETRIC per-document edge array
  * struct<src, dst: string, w, wout: long> (both directions present —
  * the t_textrank_doc build), so every vertex has an out-edge (wout
  * defined and > 0) and an in-edge (the unrolled groupBy(dst) keeps
  * every vertex; this fold keeps vertices seen as any endpoint —
  * identical sets under symmetry). Output: array<struct<token, p>>,
  * one row per distinct vertex; null edge array → null.
  */
case class TextRankFixed(child: Expression, iters: Int, scale: Long,
    teleport: Long, dampNum: Long, dampDen: Long) extends UnaryExpression {
  require(iters >= 1, s"textrank_fixed needs iters >= 1, got $iters")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
      StructField("p", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, StringType, _, _), StructField(_, StringType, _, _),
        StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"textrank_fixed needs ARRAY<STRUCT<src STRING, dst STRING, w BIGINT, wout BIGINT>>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextRankFixed.rank(input.asInstanceOf[ArrayData], iters, scale,
      teleport, dampNum, dampDen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextRankFixed.rank($c, $iters, ${scale}L, ${teleport}L, ${dampNum}L, ${dampDen}L)")

  override protected def withNewChildInternal(newChild: Expression): TextRankFixed =
    copy(child = newChild)
}

object TextRankFixed {
  def rank(edges: ArrayData, iters: Int, scale: Long, teleport: Long,
      dampNum: Long, dampDen: Long): ArrayData = {
    val n = edges.numElements()
    // vertex-index the tokens in first-seen order (order never leaks
    // into the result: sums commute and the output carries the token)
    val idx = new java.util.HashMap[UTF8String, Integer](n * 2)
    val toks = new java.util.ArrayList[UTF8String](n)
    def id(u: UTF8String): Int = {
      val got = idx.get(u)
      if (got != null) got.intValue()
      else { val i = toks.size(); idx.put(u, Integer.valueOf(i)); toks.add(u); i }
    }
    val srcs = new Array[Int](n)
    val dsts = new Array[Int](n)
    val ws = new Array[Long](n)
    val wouts = new Array[Long](n)
    var i = 0
    while (i < n) {
      // loud on null structs/fields (the DctHash63 convention):
      // getUTF8String/getLong on a null slot would silently corrupt
      // the vertex table or divide by an undefined wout
      require(!edges.isNullAt(i), s"textrank_fixed: null edge struct at $i")
      val e = edges.getStruct(i, 4)
      require(!e.isNullAt(0) && !e.isNullAt(1) && !e.isNullAt(2) && !e.isNullAt(3),
        s"textrank_fixed: null field in edge struct at $i")
      srcs(i) = id(e.getUTF8String(0).clone())
      dsts(i) = id(e.getUTF8String(1).clone())
      ws(i) = e.getLong(2)
      wouts(i) = e.getLong(3)
      i += 1
    }
    val m = toks.size()
    var p = Array.fill(m)(scale)
    var it = 0
    while (it < iters) {
      val c = new Array[Long](m)
      var j = 0
      while (j < n) {
        c(dsts(j)) += p(srcs(j)) * ws(j) / wouts(j)
        j += 1
      }
      var t = 0
      while (t < m) { c(t) = teleport + dampNum * c(t) / dampDen; t += 1 }
      p = c
      it += 1
    }
    val out = new Array[Any](m)
    var t = 0
    while (t < m) {
      out(t) = new GenericInternalRow(Array[Any](toks.get(t), p(t)))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API — defaults match the t_textrank_doc unroll
    * (scale 10⁶, teleport 0.15·scale, damping 85/100). */
  def textrankFixed(edges: Column, iters: Int, scale: Long = 1000000L,
      teleport: Long = 150000L, dampNum: Long = 85L, dampDen: Long = 100L): Column =
    Bridge.column(TextRankFixed(Bridge.expression(edges), iters, scale,
      teleport, dampNum, dampDen))
}
