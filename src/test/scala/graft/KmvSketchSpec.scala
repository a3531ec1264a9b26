package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch

/** Pins for the KMV aggregate: the sketch must equal the brute-force
  * bottom-k of the distinct value set, independent of row order,
  * partitioning and duplication; the buffer's insert must be a
  * correct sorted distinct-insert at the boundary cases. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vals: Seq[Long], k: Int): Seq[Long] =
    vals.distinct.sorted.take(k)

  test("sketch equals brute-force bottom-k across partitionings and duplication") {
    val vals = (0 until 500).map(i => ((i * 2654435761L) % 1000003L).abs)
    val dup = vals ++ vals.take(200) ++ vals.drop(300) // heavy duplication
    for (k <- Seq(1, 7, 16, 64); parts <- Seq(1, 13)) {
      val got = dup.toDF("h").repartition(parts)
        .agg(KmvSketch.kmv(col("h"), k).as("sk"))
        .select("sk").as[Seq[Long]].head()
      assert(got === brute(dup.map(identity), k), s"k=$k parts=$parts")
    }
  }

  test("grouped sketches stay per-group and merge across partitions") {
    val rows = (0 until 300).map(i => ((i % 3).toLong, (i * 7919L) % 10007L))
    val got = rows.toDF("g", "h").repartition(11)
      .groupBy("g").agg(KmvSketch.kmv(col("h"), 8).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    (0L to 2L).foreach { g =>
      val expect = brute(rows.filter(_._1 == g).map(_._2), 8)
      assert(got(g) === expect, s"group $g")
    }
  }

  test("estimate: exact below k, (k-1)*2^56/h_k at and past k") {
    // below k: 5 distincts with k=8 -> exact 5
    val small = Seq(5L, 1L, 3L, 1L, 2L, 4L).toDF("h")
      .agg(KmvSketch.kmv(col("h"), 8).as("sk"))
      .select(KmvSketch.estimate(col("sk"), 8)).as[Long].head()
    assert(small === 5L)
    // at k: h_k known -> closed-form value
    val hs = (1 to 10).map(i => i * 1000000000000L)
    val est = hs.toDF("h").agg(KmvSketch.kmv(col("h"), 8).as("sk"))
      .select(KmvSketch.estimate(col("sk"), 8)).as[Long].head()
    val expect = BigDecimal(7.0 * 7.2057594037927936e16 / (8 * 1000000000000L))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(est === expect)
  }

  test("null hashes contribute nothing") {
    val got = Seq(Some(3L), None, Some(1L), None, Some(2L))
      .toDF("h").agg(KmvSketch.kmv(col("h"), 4).as("sk"))
      .select("sk").as[Seq[Long]].head()
    assert(got === Seq(1L, 2L, 3L))
  }
}
