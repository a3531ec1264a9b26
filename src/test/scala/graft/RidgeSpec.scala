package graft

import org.apache.spark.sql.functions._
import graft.ext.Ridge

/** Behavioral pins for the ridge linear probe: the bounded
  * damped-Jacobi sweep must actually SOLVE well-conditioned systems
  * (not merely iterate), must contract monotonically in the
  * well-conditioned regime the damping guarantees, and the moments it
  * consumes must be the exact fixed-point ones (order-independent). */
class RidgeSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic corpus whose labels are an EXACT (noise-free) linear
    * readout y = Σ w*_k x_k with w* = (20, -10, 0, …): features on a
    * 0.1 grid make 20·x0 − 10·x1 an exact integer, so the least-
    * squares optimum IS w* and tiny λ barely shrinks it. Values on a
    * coarse grid so fixed-point rounding at scale 1e3 is exact. */
  private def linearCorpus(n: Int, d: Int): Seq[(Long, Seq[Double], Int)] = {
    (0 until n).map { r =>
      val v = Seq.tabulate(d)(k => (((r * 31 + k * 17 + r * k * 13) % 21) - 10) / 10.0)
      val y = math.round(20.0 * v(0) - 10.0 * v(1)).toInt
      (r.toLong, v, y)
    }
  }

  test("jacobiSweeps recovers the generating weights of an exact linear readout") {
    val d = 8
    val df = linearCorpus(400, d).toDF("vec_id", "embedding", "label")
    val (gm, b) = Ridge.moments(df, "embedding", "label", d, 1000.0)
    val w = Ridge.jacobiSweeps(gm, b, 0.01, 400)
    assert(math.abs(w(0) - 20.0) < 0.1, s"w0=${w(0)}")
    assert(math.abs(w(1) + 10.0) < 0.1, s"w1=${w(1)}")
    (2 until d).foreach(k => assert(math.abs(w(k)) < 0.1, s"w$k=${w(k)}"))
  }

  test("sweeps contract the normal-equation residual monotonically") {
    val d = 8
    val df = linearCorpus(400, d).toDF("vec_id", "embedding", "label")
    val (gm, b) = Ridge.moments(df, "embedding", "label", d, 1000.0)
    def residual(w: Array[Double]): Double = {
      val r = Array.tabulate(d) { i =>
        b(i) - (0 until d).map(j => (gm(i)(j) + (if (i == j) 5.0 else 0.0)) * w(j)).sum
      }
      math.sqrt(r.map(x => x * x).sum)
    }
    val r10 = residual(Ridgesweeps(gm, b, 10))
    val r30 = residual(Ridgesweeps(gm, b, 30))
    val r60 = residual(Ridgesweeps(gm, b, 60))
    assert(r30 < r10 && r60 < r30, s"residuals must fall: $r10 -> $r30 -> $r60")
  }

  private def Ridgesweeps(gm: Array[Array[Double]], b: Array[Double], n: Int) =
    Ridge.jacobiSweeps(gm, b, 5.0, n)

  test("moments are partition-count independent (exact integers cross the shuffle)") {
    val d = 8
    val rows = linearCorpus(200, d)
    val one = Ridge.moments(rows.toDF("vec_id", "embedding", "label").coalesce(1),
      "embedding", "label", d, 1000.0)
    val many = Ridge.moments(rows.toDF("vec_id", "embedding", "label").repartition(13),
      "embedding", "label", d, 1000.0)
    assert(one._1.map(_.toSeq).toSeq === many._1.map(_.toSeq).toSeq)
    assert(one._2.toSeq === many._2.toSeq)
  }

  test("scoreFrame scores with the round-4 emission of fitFrame's weights") {
    val d = 8
    val df = linearCorpus(120, d).toDF("vec_id", "embedding", "label")
    val w4 = Ridge.fittedWeights(df, d, 1000.0, 5.0, 30)
    val scored = Ridge.scoreFrame(df, d, 1000.0, 5.0, 30)
      .orderBy("vec_id").as[(Long, Long, Double)].collect()
    val raw = linearCorpus(120, d)
    scored.zip(raw).foreach { case ((id, _, yhat), (rid, v, _)) =>
      assert(id === rid)
      val expect = BigDecimal(v.zip(w4).map { case (x, w) => x * w }.sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(yhat - expect) < 1e-9, s"vec $id: $yhat vs $expect")
    }
  }
}
