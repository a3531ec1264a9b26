package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.codec.BigEndianInt32

/** SQL-surface registration for graft's expression layer, via the
  * standard extension point:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * // or, on a live session:
  * GraftExtensions.registerAll(spark)
  * spark.sql("SELECT be_int(value) FROM kafka_records")
  * }}}
  *
  * Registered surface: `be_int` (the one parity-mandated native
  * Expression — binary big-endian decode, SURVEY.md §7.3), the vector
  * scalars `vec_dot` / `vec_l2sq`, the plan-time-geometry `pq_encode`,
  * and the `minhash_sketch` AGGREGATE (width is an INT literal; the
  * analyzer wraps the resolved AggregateFunction). Everything else in
  * the codec layer is composed from built-ins and needs no
  * registration — the q_sql_* registry rows drive whole operator
  * pipelines through this surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.beIntDescriptor)
    e.injectFunction(GraftExtensions.vecDotDescriptor)
    e.injectFunction(GraftExtensions.vecL2SqDescriptor)
    e.injectFunction(GraftExtensions.pqEncodeDescriptor)
    e.injectFunction(GraftExtensions.minhashSketchDescriptor)
    e.injectFunction(GraftExtensions.kmvSketchDescriptor)
  }
}

object GraftExtensions {
  private def beIntBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "be_int takes exactly one BINARY argument")
    BigEndianInt32(exprs.head)
  }

  private def vecDotBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot takes exactly two ARRAY<DOUBLE> arguments")
    graft.functions.VectorDot(exprs.head, exprs(1))
  }

  private def vecL2SqBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_l2sq takes exactly two ARRAY<DOUBLE> arguments")
    graft.functions.VectorL2Sq(exprs.head, exprs(1))
  }

  private def pqEncodeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 5,
      "pq_encode takes (vec ARRAY<DOUBLE>, seeds ARRAY<ARRAY<DOUBLE>>, m INT, sub INT, kCodes INT)")
    def intLit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
          org.apache.spark.sql.types.IntegerType) => v
      case _ => throw new IllegalArgumentException(
        s"pq_encode: $name must be an INT literal (codebook geometry is plan-time)")
    }
    graft.functions.PqEncode(exprs(0), exprs(1),
      intLit(exprs(2), "m"), intLit(exprs(3), "sub"), intLit(exprs(4), "kCodes"))
  }

  private def minhashSketchBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "minhash_sketch takes (h BIGINT, k INT literal)")
    val k = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
          org.apache.spark.sql.types.IntegerType) => v
      case _ => throw new IllegalArgumentException(
        "minhash_sketch: k must be an INT literal (sketch width is plan-time)")
    }
    // returned UNWRAPPED: the analyzer wraps an AggregateFunction
    // resolved from the registry in its AggregateExpression, exactly
    // as for the built-in aggregates
    graft.functions.MinHashSketch(exprs.head, k)
  }

  private[graft] val beIntDescriptor =
    (FunctionIdentifier("be_int"),
      new ExpressionInfo(classOf[BigEndianInt32].getName, "be_int"),
      (exprs: Seq[Expression]) => beIntBuilder(exprs))

  private[graft] val vecDotDescriptor =
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => vecDotBuilder(exprs))

  private[graft] val vecL2SqDescriptor =
    (FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[graft.functions.VectorL2Sq].getName, "vec_l2sq"),
      (exprs: Seq[Expression]) => vecL2SqBuilder(exprs))

  private[graft] val pqEncodeDescriptor =
    (FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[graft.functions.PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => pqEncodeBuilder(exprs))

  private def kmvSketchBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "kmv_sketch takes (h BIGINT, k INT literal)")
    val k = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
          org.apache.spark.sql.types.IntegerType) => v
      case _ => throw new IllegalArgumentException(
        "kmv_sketch: k must be an INT literal (sketch width is plan-time)")
    }
    graft.functions.KmvSketch(exprs.head, k)
  }

  private[graft] val kmvSketchDescriptor =
    (FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[graft.functions.KmvSketch].getName, "kmv_sketch"),
      (exprs: Seq[Expression]) => kmvSketchBuilder(exprs))

  private[graft] val minhashSketchDescriptor =
    (FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[graft.functions.MinHashSketch].getName, "minhash_sketch"),
      (exprs: Seq[Expression]) => minhashSketchBuilder(exprs))

  /** Register on an already-built session (temp-function scope).
    * IDEMPOTENT: every q_sql_* builder calls this, and an
    * unconditional createOrReplaceTempFunction spammed seven
    * "function X replaced a previously registered function" WARN
    * lines into the bench tail PER RUN — the driver keeps only a
    * ~2000-char stdout tail that has head-truncated the contract line
    * before (rounds 2-3, parsed:null). Skip when already present. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(
      "be_int" -> (beIntBuilder _),
      "vec_dot" -> (vecDotBuilder _),
      "vec_l2sq" -> (vecL2SqBuilder _),
      "pq_encode" -> (pqEncodeBuilder _),
      "minhash_sketch" -> (minhashSketchBuilder _),
      "kmv_sketch" -> (kmvSketchBuilder _)
    ).foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // the Aggregator-based sketch registers through the udaf path
    // (monomorphic, so the capacity is baked into the NAME — there is
    // no plan-time-literal hook on this API the way the imperative
    // aggregates have); same engine path as the DSL's .toColumn form
    if (!reg.functionExists(FunctionIdentifier("misra_gries_1024")))
      spark.udf.register("misra_gries_1024",
        org.apache.spark.sql.functions.udaf(
          new graft.functions.MisraGries.MGAgg(1024),
          org.apache.spark.sql.Encoders.STRING))
    ()
  }
}
