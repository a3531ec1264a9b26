package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Behavioral pins for the model-evaluation aggregates on hand
  * frames: the AUC identities (perfect separation → 1.0, reversal →
  * 0.0, constant score → 0.5) and the average-rank tie handling the
  * integer midrank form claims. The sf-scale registry rows (s_auc /
  * s_calibration) are covered by the DuckDB oracle. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Long)]): Map[Long, Long] =
    Eval.aucByLabel(rows.toDF("label", "s_e4"))
      .select(col("label"), col("auc_e6")).as[(Long, Long)]
      .collect().toMap

  test("perfectly separating scores give AUC 1.0 (and 0.0 for the complement)") {
    val rows = Seq((1L, 9000L), (1L, 8000L), (0L, 2000L), (0L, 1000L))
    val a = auc(rows)
    assert(a(1L) === 1000000L)
    assert(a(0L) === 0L)
  }

  test("constant score gives AUC exactly 0.5 for every label") {
    val rows = Seq((1L, 5000L), (1L, 5000L), (0L, 5000L), (2L, 5000L))
    val a = auc(rows)
    assert(a.values.toSet === Set(500000L))
  }

  test("ties take average ranks: pos@{1,2} vs neg@{1} is AUC 0.75") {
    // pairs (pos, neg): tie at s=1 counts 1/2, the s=2 pos wins -> 0.75
    val a = auc(Seq((1L, 1L), (0L, 1L), (1L, 2L)))
    assert(a(1L) === 750000L)
  }

  test("AUC is invariant under monotone score transformation") {
    val base = Seq((1L, 10L), (0L, 20L), (1L, 30L), (0L, 40L), (1L, 50L))
    val mono = base.map { case (l, s) => (l, s * s + 7L) } // strictly increasing
    assert(auc(base) === auc(mono))
  }

  test("calibration bins count, average and rate exactly") {
    val scored = Seq((1L, 500L), (0L, 700L), (1L, 9900L), (1L, 10000L))
      .toDF("label", "s_e4")
    val out = Eval.calibration(scored, col("label") === 1L)
      .orderBy("bin")
      .select(col("bin"), col("n"), col("mean_pred_e4"), col("frac_pos_e4"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // bin 0: scores 500, 700 -> mean 600, 1 of 2 positive
    // bin 9: scores 9900, 10000 (edge clamps in) -> mean 9950, 2/2
    assert(out === Seq((0L, 2L, 600L, 5000L), (9L, 2L, 9950L, 10000L)))
  }
}
