package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the LATEST right row with the same
  * key and right.time <= left.time (the temporal-correlation join the
  * reference approximates by eyeballing timestamps across logs).
  *
  * Spark has no native as-of join; the composition here is the
  * union-and-running-window form (SURVEY.md §7.3 preference (a) —
  * compose built-ins before writing a custom plan node):
  * tag both sides, union, sort within each key by (time, side) so a
  * right row at time t precedes a left row at the same t, and carry
  * the most recent right values forward with last(ignoreNulls) over a
  * running window. ONE shuffle on the key, no range re-scan per row —
  * at 100 TB this is a single sort-exchange, the same cost class as
  * any keyed window, and never materializes the O(left × right)
  * candidate space a range join would.
  */
object AsOfJoin {

  /** @param rightCols right-side columns to carry (renamed `asof_<c>`)
    * @param tiebreak  deterministic per-row order within equal (key,time) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightCols: Seq[String], tiebreak: String): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    // carry the right row as ONE struct: last(ignoreNulls) must skip
    // only missing rows, never a null FIELD of the matching row —
    // independent per-column carries would stitch fields from
    // different right rows when a carried column is nullable
    val r = right.select(
        Seq(col(key), col(time), col(tiebreak)).distinct :+
          struct(rightCols.map(col): _*).as("_asof_row"): _*)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = u.withColumn("_asof_row",
      last(col("_asof_row"), ignoreNulls = true).over(w))
    rightCols.foldLeft(carried.filter(col("_side") === 1))(
        (df, c) => df.withColumn(s"asof_$c", col(s"_asof_row.$c")))
      .drop("_side", "_asof_row")
  }
}
