package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the late-round-10 widening rows (PSI, JSD,
  * confusion, diversity curve, dup weight, Simpson, runs test, scene
  * cuts, rank churn, revenue splits, file plan): the identities each
  * statistic must satisfy beyond the DuckDB oracle's value check. */
class DriftDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("PSI terms are non-negative and buckets partition the corpus") {
    val rows = SparkEntry.queries("s_psi")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, _, _, term) =>
      assert(b >= 0L && b <= 9L)
      assert(term >= -1e-12, s"PSI term must be >= 0, got $term at bucket $b")
    }
    val n = SparkEntry.T(spark, dir, "embeddings").count()
    assert(rows.map(r => r._2 + r._3).sum === n)
  }

  test("JS divergence is bounded by ln 2 and covers every source pair") {
    val rows = SparkEntry.queries("t_js_divergence")(spark, dir)
      .as[(String, String, Double)].collect()
    val k = SparkEntry.T(spark, dir, "documents")
      .select("source").distinct().count()
    assert(rows.length === k * (k - 1) / 2)
    rows.foreach { case (s1, s2, jsd) =>
      assert(s1 < s2)
      assert(jsd >= 0.0 && jsd <= math.log(2) + 1e-9, s"jsd $jsd out of range")
    }
  }

  test("confusion matrix counts partition the corpus; diagonal e4 in range") {
    val rows = SparkEntry.queries("s_confusion")(spark, dir)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(rows.map(_._3).sum ===
      SparkEntry.T(spark, dir, "embeddings").count())
    rows.foreach { case (l, p, n, rec, prec) =>
      assert(n >= 1L)
      assert(rec.isDefined === (l == p) && prec.isDefined === (l == p))
      rec.foreach(r => assert(r >= 0L && r <= 10000L))
      prec.foreach(r => assert(r >= 0L && r <= 10000L))
    }
  }

  test("gram counts fall as n rises; diversity stays a ratio") {
    val rows = SparkEntry.queries("t_diversity_curve")(spark, dir)
      .select("source", "n", "n_grams", "diversity")
      .as[(String, Long, Long, Double)].collect()
    rows.groupBy(_._1).values.foreach { sr =>
      val byN = sr.sortBy(_._2).map(_._3)
      assert(byN.zip(byN.tail).forall { case (a, b) => b <= a },
        "n_grams must be nonincreasing in n")
    }
    rows.foreach(r => assert(r._4 > 0.0 && r._4 <= 1.0))
  }

  test("dup weight never charges more tokens than exist") {
    val rows = SparkEntry.queries("d_dup_weight")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum ===
      SparkEntry.T(spark, dir, "documents").count())
    rows.foreach { case (_, nd, ndup, tt, tw, we6) =>
      assert(ndup <= nd && tw <= tt)
      assert(we6 >= 0L && we6 <= 1000000L)
    }
  }

  test("Simpson diversity is a probability; runs partition the sign days") {
    SparkEntry.queries("t_simpson")(spark, dir)
      .as[(String, Long, Long)].collect()
      .foreach { case (_, n, s) => assert(n >= 2L && s >= 0L && s <= 1000000L) }
    SparkEntry.queries("a_runs_test")(spark, dir)
      .select("n_signs", "n_plus", "n_minus", "n_runs")
      .as[(Long, Long, Long, Long)].collect()
      .foreach { case (n, np, nm, r) =>
        assert(np + nm === n)
        assert(r >= 1L && r <= n)
      }
  }

  test("scene cuts emit exactly seven transitions per asset") {
    val rows = SparkEntry.queries("m_scene_cut")(spark, dir)
      .select("n_trans").as[Long].collect()
    assert(rows.length === SparkEntry.T(spark, dir, "documents").count())
    assert(rows.forall(_ === 7L))
  }

  test("rank churn statuses are consistent and ranks stay in 1..20") {
    val rows = SparkEntry.queries("a_rank_churn")(spark, dir)
      .as[(Long, Option[Int], Option[Int], String, Int)].collect()
    assert(rows.length >= 20 && rows.length <= 40)
    rows.foreach { case (_, r0, r1, st, _) =>
      (r0, r1) match {
        case (Some(a), Some(b)) =>
          assert(st === "stayed" && a >= 1 && a <= 20 && b >= 1 && b <= 20)
        case (Some(a), None) => assert(st === "exited" && a >= 1 && a <= 20)
        case (None, Some(b)) => assert(st === "entered" && b >= 1 && b <= 20)
        case _ => fail("a churn row must carry at least one rank")
      }
    }
    assert(rows.count(_._4 != "exited") === 20,
      "period-1 leaderboard must hold exactly 20 parts")
    assert(rows.count(_._4 != "entered") === 20,
      "period-0 leaderboard must hold exactly 20 parts")
  }

  test("repeat-revenue split partitions orders and cents exactly") {
    val rows = SparkEntry.queries("a_repeat_revenue")(spark, dir)
      .select("new_rev_fx", "repeat_rev_fx", "n_new", "n_repeat")
      .as[(Long, Long, Long, Long)].collect()
    val ord = SparkEntry.T(spark, dir, "orders")
    assert(rows.map(r => r._3 + r._4).sum === ord.count())
    val cents = ord.agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .as[Long].head()
    assert(rows.map(r => r._1 + r._2).sum === cents)
  }

  test("cohort LTV accumulates monotonically to the cohort total") {
    val rows = SparkEntry.queries("a_cohort_ltv")(spark, dir)
      .select("cohort_week_us", "week_offset", "rev_fx", "cum_rev_fx")
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).values.foreach { cr =>
      val sorted = cr.sortBy(_._2)
      val cums = sorted.map(_._4)
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
      assert(cums.last === sorted.map(_._3).sum)
    }
  }

  test("seasonal-naive errors and file plan are internally consistent") {
    SparkEntry.queries("a_seasonal_naive")(spark, dir)
      .select("n_backtest", "sum_abs_err", "max_abs_err", "bias", "mae_fx")
      .as[(Long, Long, Long, Long, Long)].collect()
      .foreach { case (n, sae, mx, bias, mae) =>
        assert(n >= 1L && mae <= mx && math.abs(bias) <= sae)
        assert(mae === sae / n)
      }
    val fp = SparkEntry.queries("p_file_plan")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(fp.map(_._1).toSet === Set("events", "documents", "lineitem"))
    fp.foreach { case (_, nRows, bytes, nFiles, rpf) =>
      assert(nFiles >= 1L && rpf * nFiles <= nRows)
      assert(bytes > nRows, "every row costs more than one byte")
    }
  }
}
