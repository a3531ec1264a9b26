package graft

import org.apache.spark.sql.functions._
import graft.functions.GramMatrixFixed.gramFixed

class GramMatrixFixedSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 3
  private val vecs = Seq(
    Seq(1.0, 2.0, 3.0),
    Seq(0.5, -1.0, 2.5),
    Seq(-2.0, 0.25, 1.0),
    Seq(10.0, 0.0, -0.5))

  private def expected: Map[(Int, Int), Long] = {
    val fx = vecs.map(_.map(x =>
      java.math.BigDecimal.valueOf(x * 1000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong))
    (for (i <- 0 until dims; j <- i until dims) yield
      (i, j) -> fx.map(f => f(i) * f(j)).sum).toMap
  }

  private def run(parts: Int): Map[(Int, Int), Long] =
    vecs.toDF("v").repartition(parts)
      .agg(gramFixed(col("v"), dims, 1000.0).as("g"))
      .select(explode(col("g")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.gram_fx"))
      .as[(Int, Int, Long)].collect()
      .map { case (i, j, g) => (i, j) -> g }.toMap

  test("gram matrix equals the hand-computed fixed-point upper triangle") {
    assert(run(1) === expected)
  }

  test("result is partition-independent (exact integer merge)") {
    assert(run(4) === run(1))
  }

  test("rounding matches Spark's round(): HALF_UP on the scaled double") {
    val tie = Seq(Seq(0.0005, 1.0)).toDF("v") // 0.5 milli-units: rounds to 1
    val g = tie.agg(gramFixed(col("v"), 2, 1000.0).as("g"))
      .select(explode(col("g")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.gram_fx"))
      .as[(Int, Int, Long)].collect()
      .map { case (i, j, v) => (i, j) -> v }.toMap
    val viaRound = tie.select(
      (sum(round(element_at(col("v"), 1) * 1000.0).cast("long") *
        round(element_at(col("v"), 1) * 1000.0).cast("long"))).as("g00"))
      .head().getLong(0)
    assert(g((0, 0)) === viaRound)
    assert(g((0, 1)) === g((0, 0)) * 1000L) // f0·f1 with f1 = 1000
  }

  test("null arrays contribute nothing") {
    val df = (vecs.map(Option(_)) :+ None).toDF("v")
    val g = df.agg(gramFixed(col("v"), dims, 1000.0).as("g"))
      .select(explode(col("g")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.gram_fx"))
      .as[(Int, Int, Long)].collect()
      .map { case (i, j, v) => (i, j) -> v }.toMap
    assert(g === expected)
  }

  test("exceeding the overflow budget fails loudly (never wraps)") {
    // 1e9 at scale 1000 → fixed 1e12; its square overflows a long, so
    // the exact contract demands an ArithmeticException, not a wrapped
    // (silently corrupt) matrix
    val df = Seq(Seq(1e9, 0.0)).toDF("v")
    val e = intercept[Exception] {
      df.agg(gramFixed(col("v"), 2, 1000.0).as("g")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got: $e")
  }
}
