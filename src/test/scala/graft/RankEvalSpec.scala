package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the s_rank_eval / a_chi2 / a_streaks /
  * p_contract_audit registry rows beyond the DuckDB oracle: the
  * discount-literal identities NDCG's integer form relies on, and the
  * invariants each statistic must satisfy on the smoke fixture. */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("discount literals: rank-1 discount is exactly 1.0, strictly decreasing") {
    assert(SparkEntry.NdcgDiscE6.head === 1000000L)
    assert(SparkEntry.NdcgDiscE6 === SparkEntry.NdcgDiscE6.sorted.reverse)
    assert(SparkEntry.NdcgDiscE6.distinct === SparkEntry.NdcgDiscE6)
    assert(SparkEntry.NdcgIdcgE6 ===
      SparkEntry.NdcgDiscE6.scanLeft(0L)(_ + _).tail)
  }

  test("rank metrics stay in range and agree with their own parts") {
    val rows = SparkEntry.queries("s_rank_eval")(spark, dir)
      .as[(Long, Int, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nRel, hits10, dcg, idcg, ndcg, ap) =>
      assert(hits10 <= math.min(nRel, 10L))
      idcg.foreach(i => assert(dcg <= i, "DCG can never beat the ideal"))
      ndcg.foreach(n => assert(n >= 0L && n <= 10000L))
      ap.foreach(a => assert(a >= 0L && a <= 10000L))
      if (nRel == 0) assert(ndcg.isEmpty && ap.isEmpty)
    }
  }

  test("a perfect prefix would give NDCG exactly 10000 in this integer form") {
    // all-relevant top-10 against n_rel >= 10: dcg == idcg by the
    // prefix-sum construction, and 10000·x div x == 10000
    val full = SparkEntry.NdcgDiscE6.sum
    assert(full * 10000L / full === 10000L)
  }

  test("chi2 audit: dof and totals are consistent, statistic non-negative") {
    val r = SparkEntry.queries("a_chi2")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length === 1)
    val (n, nTypes, nDows, dof, chi2, maxC) = r.head
    assert(dof === (nTypes - 1) * (nDows - 1))
    assert(chi2 >= 0L && maxC >= 0L && maxC <= chi2)
    assert(n === SparkEntry.T(spark, dir, "events").count())
  }

  test("streaks partition active days exactly") {
    val st = SparkEntry.queries("a_streaks")(spark, dir)
    val totalActive = st.agg(sum("n_active_days")).as[Long].head()
    val distinctDays = SparkEntry.T(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().count()
    assert(totalActive === distinctDays)
    st.as[(Long, Long, Long, Long, Long)].collect().foreach {
      case (_, active, streaks, best, _) =>
        assert(best >= 1L && best <= active)
        assert(streaks >= 1L && streaks <= active)
    }
  }

  test("contract audit covers every declared rule exactly once") {
    val rows = SparkEntry.queries("p_contract_audit")(spark, dir)
      .select("table_name", "rule").as[(String, String)].collect()
    assert(rows.length === rows.distinct.length)
    assert(rows.length === 10)
    assert(rows.map(_._1).toSet === Set("lineitem", "orders", "events"))
  }
}
