package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the a_markov_stationary / m_aspect_bucket /
  * a_pareto / a_interpurchase registry rows beyond the DuckDB oracle:
  * the conservation and partition identities each statistic must
  * satisfy on the smoke fixture. */
class MarkovParetoSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("markov stationary mass never grows and stays on known states") {
    val v = SparkEntry.queries("a_markov_stationary")(spark, dir)
      .as[(String, Long)].collect()
    assert(v.nonEmpty)
    v.foreach { case (_, m) => assert(m >= 0L) }
    val types = SparkEntry.T(spark, dir, "events")
      .select("event_type").distinct().as[String].collect().toSet
    assert(v.map(_._1).toSet.subsetOf(types))
    // substochastic truncating steps can only lose mass vs the
    // uniform 1e6-per-state start
    assert(v.map(_._2).sum <= 1000000L * types.size)
  }

  test("conserving markov keeps the exact total and covers every state") {
    val types = SparkEntry.T(spark, dir, "events")
      .select("event_type").distinct().as[String].collect().toSet
    val v = SparkEntry.queries("a_markov_conserve")(spark, dir)
      .as[(String, Long)].collect()
    // the redistribution term makes conservation EXACT: sum = |S|*1e6
    // bit-for-bit, and no state ever drops out of the vector
    assert(v.map(_._2).sum === 1000000L * v.length)
    assert(v.map(_._1).toSet === types.intersect(v.map(_._1).toSet))
    assert(v.forall(_._2 >= 0L))
    // it is a genuinely different answer than the leaky sibling
    val leaky = SparkEntry.queries("a_markov_stationary")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(v.map(_._2).sum > leaky.values.sum)
  }

  test("aspect buckets partition the corpus over the declared ladder") {
    val ladder = Map(1L -> (256L, 1024L), 2L -> (320L, 832L),
      3L -> (384L, 704L), 4L -> (448L, 576L), 5L -> (512L, 512L),
      6L -> (576L, 448L), 7L -> (704L, 384L), 8L -> (832L, 320L),
      9L -> (1024L, 256L))
    val rows = SparkEntry.queries("m_aspect_bucket")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, bw, bh, n, ss) =>
      assert(ladder(id) === ((bw, bh)))
      assert(n >= 1L && ss >= 0L)
    }
    assert(rows.map(_._4).sum ===
      SparkEntry.T(spark, dir, "documents").count())
  }

  test("pareto classes partition parts and A really covers 80 percent") {
    val rows = SparkEntry.queries("a_pareto")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf(Set("A", "B", "C")))
    assert(rows.map(_._1).distinct.length === rows.length)
    val nParts = SparkEntry.T(spark, dir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_._2).sum === nParts)
    val t = rows.map(_._3).sum
    val revA = rows.find(_._1 == "A").map(_._3).getOrElse(0L)
    // by construction the straddling bucket belongs to A, so either
    // A alone crosses the 80% line or there is nothing after A
    if (rows.exists(r => r._1 == "B" || r._1 == "C"))
      assert(revA * 100L >= 80L * t)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
  }

  test("inter-purchase gaps count orders minus customers, CDF ends at 1") {
    val rows = SparkEntry.queries("a_interpurchase")(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (gap, n, _) => assert(gap >= 0L && n >= 1L) }
    val orders = SparkEntry.T(spark, dir, "orders")
    val expected = orders.count() -
      orders.select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum === expected)
    assert(rows.map(_._3).toSeq === rows.map(_._3).sorted.toSeq)
    assert(rows.last._3 === 1000000L)
  }
}
