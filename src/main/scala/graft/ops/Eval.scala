package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation aggregates over a scored frame with columns
  * `label` (any groupable type) and `s_e4` (the model score in e4
  * fixed point, 0..10000) — shared by the registry rows s_auc /
  * s_calibration and unit-testable on hand frames.
  *
  * Everything is exact integer arithmetic: sums of longs and
  * truncating divisions of non-negative longs, identical in Spark
  * (`div`) and DuckDB (`//`), so the oracle compare is bit-exact.
  */
object Eval {

  /** One-vs-rest ROC-AUC per label by the rank-sum (Mann–Whitney)
    * identity with average-rank tie handling, held entirely in
    * integers: from the score histogram, every member of a tie group
    * starting at rank `start` with `c` members has doubled midrank
    * 2·start + c − 1, and
    * AUC_e6 = (ΣR₂ − npos(npos+1)) · 5·10⁵ ÷ (npos·nneg).
    *
    * The histogram is bounded by score cardinality (≤ 10001 distinct
    * e4 values), so its cumulative-rank window is NOT a global data
    * window — the row-level sort a naive rank() would need never
    * happens; the data-sized passes are two partial-aggregated
    * groupBys. Exact while n·npos < 2⁶³/10⁶ (~2·10⁹ rows per label);
    * past that the same histogram feeds a double ratio. */
  def aucByLabel(scored: DataFrame): DataFrame = {
    val hist = scored.groupBy("s_e4").agg(count(lit(1)).as("c"))
    val starts = hist.withColumn("start",
      coalesce(sum(col("c")).over(
        Window.orderBy("s_e4").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) + lit(1L))
    val perLS = scored.groupBy(col("s_e4"), col("label")).agg(count(lit(1)).as("n_ls"))
    val tot = scored.agg(count(lit(1)).as("n_tot"))
    perLS.join(starts, "s_e4")
      .groupBy("label")
      .agg(sum(col("n_ls") * (lit(2L) * col("start") + col("c") - lit(1L)))
        .as("sum_r2"),
        sum(col("n_ls")).as("npos"))
      .crossJoin(broadcast(tot))
      .select(col("label"), col("npos"), (col("n_tot") - col("npos")).as("nneg"),
        expr("(sum_r2 - npos * (npos + 1)) * 500000 div (npos * (n_tot - npos))")
          .as("auc_e6"))
  }

  /** Reliability (calibration) table: `bins` equal-width score bins,
    * each with its count, mean predicted probability (e4) and
    * observed positive rate (e4) against the boolean target `pos`.
    * One partial-agg pass; the s_e4 = 10000 edge clamps into the top
    * bin. */
  def calibration(scored: DataFrame, pos: Column, bins: Int = 10): DataFrame =
    scored
      .select(least(expr(s"s_e4 div ${10000 / bins}"), lit(bins - 1L)).as("bin"),
        col("s_e4"), pos.cast("long").as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        expr("sum(s_e4) div count(1)").as("mean_pred_e4"),
        expr("sum(pos) * 10000 div count(1)").as("frac_pos_e4"))
}
