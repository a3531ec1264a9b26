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

  test("keys above 16 bits fail loudly instead of silently aliasing") {
    val li = Seq((70000L, 3L, 1L, 1L), (2L, 5L, 2L, 1L))
      .toDF("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
    val e = intercept[Exception] { Layout.zorderHist(li, 4).collect() }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: messages(t.getCause)
    assert(messages(e).exists(_.contains("16 bits")), s"got: $e")
    val e2 = intercept[Exception] { Layout.skippingReport(li, 4).collect() }
    assert(messages(e2).exists(_.contains("16 bits")), s"got: $e2")
  }

  private def rangeFixture = (0 until 1200).map { i =>
    ((i * 7 % 300).toLong, (i * 13 % 200).toLong, i.toLong, (i % 7).toLong)
  }.toDF("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")

  test("range twin conserves rows and cuts disjoint z intervals (the co-location property)") {
    val hist = Layout.zorderHistRange(rangeFixture, 16)
      .orderBy("min_z")
      .select("n_rows", "min_z", "max_z")
      .as[(Long, Long, Long)].collect()
    assert(hist.map(_._1).sum === 1200)
    assert(hist.length <= 16)
    // range partitioning guarantees pairwise-disjoint z intervals —
    // exactly the property a Z-order rewrite buys; sampled boundaries
    // may produce unequal (even empty) files, never overlapping ones
    hist.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) =>
        assert(hi <= lo, s"overlapping z intervals: $hi > $lo")
      case _ =>
    }
  }

  test("range skipping twin agrees with the exact form where bucketing cannot matter") {
    val exact = Layout.skippingReport(rangeFixture, 16)
      .select("layout", "predicate", "rows_matched")
      .as[(String, String, Long)].collect()
      .map { case (l, p, m) => (l, p) -> m }.toMap
    val got = Layout.skippingReportRange(rangeFixture, 16)
      .select("layout", "predicate", "n_buckets", "rows_scanned", "rows_matched")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.length === 6) // 3 layouts × 2 predicates
    got.foreach { case (layout, pred, nb, scanned, matched) =>
      // match counts are bucketing-independent: they must equal the
      // exact form's no matter where sampled boundaries landed
      assert(matched === exact((layout, pred)), s"$layout/$pred matched")
      assert(scanned >= matched, s"$layout/$pred scanned < matched")
      assert(scanned <= 1200, s"$layout/$pred scanned > table")
      assert(nb <= 16)
    }
    // the layout argument survives sampling: sorting by the probe key
    // itself must prune at least as well as the unrelated natural order
    val bySk = got.filter(_._2 == "sk_only").map(r => r._1 -> r._4).toMap
    assert(bySk("zorder") <= bySk("orderkey"),
      s"z-order should never scan more than natural order: $bySk")
  }

  test("partition-skew advisor: hot key flagged with the ceil salt factor") {
    // planted: 'hot' has one 80-row partition among four 5-row ones
    // (mean 19, max/mean ~4.2x); 'even' is perfectly uniform
    val parts = (Seq(("hot", 80L)) ++ Seq.fill(4)(("hot", 5L)) ++
      Seq.fill(5)(("even", 10L))).toDF("grp", "n_part_rows")
    val got = Layout.partitionSkew(parts)
      .as[(String, Long, Long, Long, Long, Boolean, Long)]
      .collect().map(r => r._1 -> r).toMap
    val hot = got("hot")
    assert(hot._2 === 5L && hot._3 === 100L && hot._4 === 80L)
    assert(hot._5 === 40000L) // 80*5*1e4/100 = 4x the mean
    assert(hot._6 && hot._7 === 4L) // ceil(80*5/100): 4 salts rebalance
    val even = got("even")
    assert(even._5 === 10000L && !even._6 && even._7 === 1L)
  }

  test("compaction planner: small files counted, multi-file target uses ceil") {
    // planted bytes: 'big' needs ceil(300/128)=3 target files from 6;
    // 'tiny' collapses 4 small files into 1
    val mib = 1048576L
    val files = (Seq.fill(6)(("big", 1000L, 50L * mib)) ++
      Seq.fill(4)(("tiny", 10L, mib / 2))).toDF("grp", "n_rows", "est_bytes")
    val got = Layout.compactionPlan(files, targetBytes = 128L * mib,
      smallBytes = mib)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val big = got("big")
    assert(big._2 === 6L && big._5 === 0L && big._6 === 3L && big._7 === 2L)
    val tiny = got("tiny")
    assert(tiny._2 === 4L && tiny._5 === 4L && tiny._6 === 1L && tiny._7 === 4L)
  }
}
