package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Pins for the physical-layout family: the Morton spread must equal
  * a bit-by-bit reference, zValue must be jointly monotone (the bound
  * skippingReport's bucketing relies on), and equal-count bucketing
  * must cut files that differ by at most one row. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-by-bit reference interleave. */
  private def refZ(a: Int, b: Int): Long = {
    var z = 0L
    for (k <- 0 until 16) {
      z |= ((a >> k) & 1).toLong << (2 * k)
      z |= ((b >> k) & 1).toLong << (2 * k + 1)
    }
    z
  }

  test("zValue equals the bit-by-bit reference interleave") {
    val pairs = for { a <- Seq(0, 1, 7, 99, 1999, 65535); b <- Seq(0, 1, 5, 99, 65535) }
      yield (a.toLong, b.toLong)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === refZ(a.toInt, b.toInt), s"z($a,$b)")
    }
  }

  test("zValue is jointly monotone: z(a,b) <= z(maxA,maxB) for a<=maxA, b<=maxB") {
    val (maxA, maxB) = (173, 45)
    val bound = refZ(maxA, maxB)
    for (a <- 0 to maxA by 7; b <- 0 to maxB by 3)
      assert(refZ(a, b) <= bound, s"z($a,$b) exceeds z($maxA,$maxB)")
  }

  test("equal-count z bucketing cuts files that differ by at most one row") {
    val li = (0 until 997).map { i =>
      (i.toLong % 50, (i * 13 % 97).toLong, i.toLong, (i % 7).toLong)
    }.toDF("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
    val sizes = Layout.zorderHist(li, 16).select("n_rows").as[Long].collect()
    assert(sizes.length === 16)
    assert(sizes.sum === 997)
    assert(sizes.max - sizes.min <= 1, s"sizes: ${sizes.toSeq}")
  }

  test("per-file stats cover their rows: suppkey-disjoint predicate prunes everything") {
    // all suppkeys in [0, 9]; a predicate on [50, 60] must prune every file
    val li = (0 until 200).map { i =>
      ((i % 20).toLong, (i % 10).toLong, i.toLong, 1L)
    }.toDF("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
    val hist = Layout.zorderHist(li, 8)
      .agg(max("max_sk").as("mx"), min("min_sk").as("mn"))
      .as[(Long, Long)].head()
    assert(hist._1 <= 9 && hist._2 >= 0)
  }
}
