package graft

import org.apache.spark.sql.functions._

/** Pins for the densified Lorenz twin: on an n < 10 revenue frame the
  * dense form emits the degenerate (member-count-zero) deciles as
  * explicit (0, 0.0) rows the sparse form drops, and on any n ≥ 10
  * frame the two forms are row-identical. */
class LorenzDenseSpec extends SparkSpec {
  import spark.implicits._

  private def revFrame(xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("k_id", "x")

  test("n < 10: dense emits all ten deciles, zeros where members floor to 0") {
    val rev = revFrame(Seq(100L, 250L, 400L, 1000L)) // n = 4
    val dense = SparkEntry.lorenzDeciles(spark, rev, dense = true)
      .orderBy("k").collect()
    assert(dense.length === 10)
    // (k*4) div 10 = 0 for k = 1, 2 — degenerate, explicit zeros
    dense.take(2).foreach { r =>
      assert(r.getAs[Long]("n_members") === 0L)
      assert(r.getAs[Double]("cum_share") === 0.0)
    }
    // k = 10 covers everyone: share is exactly 1
    assert(dense.last.getAs[Long]("n_members") === 4L)
    assert(math.abs(dense.last.getAs[Double]("cum_share") - 1.0) < 1e-9)
    // the sparse form drops exactly the degenerate rows and agrees on
    // the rest
    val sparse = SparkEntry.lorenzDeciles(spark, rev, dense = false)
      .orderBy("k").collect()
    assert(sparse.length === 8)
    assert(sparse.map(_.toSeq).toSeq === dense.drop(2).map(_.toSeq).toSeq)
  }

  test("n >= 10: dense and sparse are row-identical") {
    val rnd = new scala.util.Random(7)
    val rev = revFrame(Seq.fill(37)(100L + rnd.nextInt(100000).toLong))
    val dense = SparkEntry.lorenzDeciles(spark, rev, dense = true)
      .orderBy("k").collect().map(_.toSeq).toSeq
    val sparse = SparkEntry.lorenzDeciles(spark, rev, dense = false)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(dense === sparse)
    assert(dense.length === 10)
  }
}
