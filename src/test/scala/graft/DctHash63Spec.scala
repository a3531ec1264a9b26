package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.functions.DctHash63

/** Pins for the fused DCT perceptual hash: equality with a plain
  * Scala replica of the documented algebra on random grids, basis
  * sanity, invariances, and the loud shape contract. */
class DctHash63Spec extends SparkSpec {
  import spark.implicits._

  /** Straight-line replica of the documented algebra. */
  private def replica(x: Seq[Long]): Long = {
    val a = Multimodal.DctBasisE6
    val y = Array.tabulate(64) { t =>
      val (u, j) = (t / 8, t % 8)
      (0 until 8).map(k => a(u * 8 + k) * x(k * 8 + j)).sum
    }
    val ac = (1 until 64).map { t =>
      val (u, v) = (t / 8, t % 8)
      (0 until 8).map(j => a(v * 8 + j) * y(u * 8 + j)).sum
    }
    val med2 = ac.sorted.apply(31) * 2
    (0 until 63).map(i => if (ac(i) * 2 > med2) 1L << i else 0L).sum
  }

  test("matches the replica on random grids") {
    val rnd = new scala.util.Random(42)
    val grids = Seq.fill(50)(Seq.fill(64)(rnd.nextInt(256).toLong))
    val got = grids.zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "px")
      .select(col("id"), DctHash63.dctHash63(col("px")).as("h"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got === grids.map(replica))
    // bits 0..62 only: bit 63 (the long sign bit) must never be set
    assert(got.forall(_ >= 0L), "sign bit set — a 64th bit leaked in")
  }

  test("brightness shift keeps the hash; mean-threshold aHash flips") {
    // a structured gradient grid vs the same grid +40 brightness:
    // every AC coefficient is shift-invariant (the DC row/col of A
    // absorbs constants), so the DCT hash is IDENTICAL
    val base = Seq.tabulate(64)(i => (i % 8).toLong * 20 + 40)
    val shifted = base.map(_ + 40)
    assert(replica(base) === replica(shifted),
      "DCT hash must be brightness-shift invariant")
    val df = Seq((1L, base), (2L, shifted)).toDF("id", "px")
      .select(col("id"), DctHash63.dctHash63(col("px")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(df(1L) === df(2L))
  }

  test("a non-64 grid fails loudly; null stays null") {
    val e = intercept[Exception] {
      Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "px")
        .select(DctHash63.dctHash63(col("px"))).collect()
    }
    assert(e.getMessage != null)
    val got = Seq((1L, Option.empty[Seq[Long]])).toDF("id", "px")
      .select(DctHash63.dctHash63(col("px")).as("h")).collect()
    assert(got(0).isNullAt(0))
    // a null ELEMENT must be as loud as a short grid, never a silent 0
    val ne = intercept[Exception] {
      Seq((1L, Seq.fill(63)(Option(1L)) :+ Option.empty[Long])).toDF("id", "px")
        .select(DctHash63.dctHash63(col("px"))).collect()
    }
    assert(ne.getMessage.contains("null grid element") ||
      Option(ne.getCause).exists(_.getMessage.contains("null grid element")),
      s"expected the loud null-element contract error, got: ${ne.getMessage}")
  }
}
