package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering keys and a
  * data-skipping effectiveness report — the "which layout should this
  * table be rewritten in" decision a 100 TB lakehouse makes before
  * anything else, because file-level min/max pruning is the cheapest
  * scan reduction there is (every column-store reads footer stats
  * before data; a layout that co-locates both filter dimensions lets
  * the planner drop most files outright).
  *
  * Everything here is exact integer arithmetic — bit-interleaving via
  * the classic shift-and-mask spread, equal-width bucketing by
  * integer division against the data's own maxima — so the DuckDB
  * oracle replays it bit-for-bit with `<< & |` on BIGINTs. No floats,
  * no rounding conventions needed.
  *
  * Scale shape: the skipping report is ONE scan of the fact table
  * (the three candidate layouts' bucket ids are computed per row and
  * exploded, 3× rows into one partial-agg'd groupBy on (layout,
  * bucket) — ~3·B groups), plus a broadcast one-row maxima frame. At
  * 100 TB the report costs one pass; rewriting the table costs a full
  * shuffle — which is exactly why you measure before you rewrite.
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit k lands at position 2k —
    * the magic-mask half of Morton interleaving. Stays in Catalyst
    * built-ins (codegen'd, oracle-replayable with the same masks). */
  def spread16(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: a's bits on even
    * positions, b's on odd. Adjacent z values are spatially adjacent
    * in BOTH dimensions — the property the skipping report measures.
    * Monotone bound: spread16 is order-preserving and the two
    * operands' bits are disjoint (OR = sum), so
    * z(a, b) ≤ z(max_a, max_b) whenever a ≤ max_a and b ≤ max_b —
    * the bucket-width bound skippingReport divides by. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Integer division on non-negative longs via double division + long
    * cast. Exact equivalence with SQL `div`/`//` holds because the
    * numerators here are ≤ 2^38 (exactly representable) and the true
    * quotient is never within one double ulp below an integer (the
    * nearest possible gap is 1/divisor ≥ 2^-33, the ulp at these
    * magnitudes ~1e-14), so the cast truncates the same way. */
  private def idiv(a: Column, b: Column): Column = (a / b).cast("long")

  /** Per-file layout audit of lineitem Z-ordered on (l_partkey,
    * l_suppkey): row count and min/max of each dimension per
    * equal-COUNT z bucket — i.e. the per-file stats the table would
    * carry after a Z-order rewrite into `buckets` equal-sized files.
    * Equal-count (rank-based), not equal-width: a rewrite writes
    * fixed-size files, and the sparse Morton space makes equal-width
    * buckets wildly uneven (measured: 22/64 populated at sf0.01).
    *
    * The bucket assignment is a row_number over the z order (unique
    * tiebreak (l_orderkey, l_linenumber) so both engines cut files at
    * the identical row) — a global sort, which is honest: a layout
    * REWRITE is a sort; at 100 TB the same assignment runs as
    * repartitionByRange(z) + per-file stats, with sampled boundaries
    * instead of exact ranks. */
  def zorderHist(lineitem: DataFrame, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val z = zValue(col("l_partkey"), col("l_suppkey"))
    val zf = lineitem.select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
      col("l_linenumber"), z.as("z"))
    val n = zf.agg(count(lit(1)).as("n_total"))
    zf.crossJoin(broadcast(n))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))))
      .select(col("l_partkey"), col("l_suppkey"),
        idiv((col("rn") - 1) * buckets, col("n_total")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
  }

  /** Data-skipping effectiveness of three candidate sort layouts of
    * lineitem — `zorder` on (l_partkey, l_suppkey), single-key
    * `partkey`, and the natural `orderkey` order — against a fixed
    * two-dimensional range predicate (partkey AND suppkey each in a
    * data-relative window). For each layout the table is divided into
    * `buckets` equal-COUNT files in that layout's sort order (what a
    * rewrite actually writes); a file is PRUNED when its (min, max)
    * stats on either predicate column cannot intersect the predicate.
    * Reports files pruned and rows actually scanned — the number a
    * 100 TB query planner cares about.
    *
    * Shape: one scan, exploded ×3 (one copy per candidate layout),
    * then a per-layout row_number to cut the equal-count files and a
    * (layout, bucket) partial agg. The 3-value window partition is a
    * deliberate oracle-exactness trade: each candidate layout IS a
    * full sort of the table (that is what's being priced); at 100 TB
    * the same report runs per layout as repartitionByRange(sortkey) +
    * mapPartitions stats, no global window. */
  def skippingReport(lineitem: DataFrame, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = lineitem.agg(
      max(col("l_partkey")).as("max_pk"),
      max(col("l_suppkey")).as("max_sk"),
      max(col("l_orderkey")).as("max_ok"),
      count(lit(1)).as("n_total"))
    val z = zValue(col("l_partkey"), col("l_suppkey"))
    val withKeys = lineitem.crossJoin(broadcast(mx))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"), col("n_total"),
        // predicate window: partkey in [max/10, max/5], suppkey in [max/10, max/5]
        (col("max_pk") / 10).cast("long").as("p_lo"),
        (col("max_pk") / 5).cast("long").as("p_hi"),
        (col("max_sk") / 10).cast("long").as("s_lo"),
        (col("max_sk") / 5).cast("long").as("s_hi"),
        explode(array(
          struct(lit("zorder").as("layout"), z.as("skey")),
          struct(lit("partkey").as("layout"), col("l_partkey").as("skey")),
          struct(lit("orderkey").as("layout"), col("l_orderkey").as("skey"))
        )).as("lb"))
    val perBucket = withKeys
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lb.layout"))
          .orderBy(col("lb.skey"), col("l_orderkey"), col("l_linenumber"))))
      .withColumn("bucket", idiv((col("rn") - 1) * buckets, col("n_total")))
      .groupBy(col("lb.layout").as("layout"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("mn_p"), max("l_partkey").as("mx_p"),
        min("l_suppkey").as("mn_s"), max("l_suppkey").as("mx_s"),
        sum(when(col("l_partkey").between(col("p_lo"), col("p_hi")) &&
                 col("l_suppkey").between(col("s_lo"), col("s_hi")), 1L)
          .otherwise(0L)).as("n_match"),
        sum(when(col("l_suppkey").between(col("s_lo"), col("s_hi")), 1L)
          .otherwise(0L)).as("n_match_sk"),
        // constant per group (one broadcast maxima row) — min is just
        // the deterministic way to carry them through the agg
        min("p_lo").as("p_lo"), min("p_hi").as("p_hi"),
        min("s_lo").as("s_lo"), min("s_hi").as("s_hi"))
    // two query shapes against the same files: the 2-D rectangle and a
    // suppkey-only range — the single-dimension probe is where a
    // single-key layout collapses (scans everything) while Z-order
    // still prunes on BOTH dimensions; that robustness across
    // predicate mixes is the reason to pay for the Z-order rewrite
    val prunedBoth = col("mx_p") < col("p_lo") || col("mn_p") > col("p_hi") ||
      col("mx_s") < col("s_lo") || col("mn_s") > col("s_hi")
    val prunedSk = col("mx_s") < col("s_lo") || col("mn_s") > col("s_hi")
    perBucket
      .select(col("layout"), col("n"), col("n_match"), col("n_match_sk"),
        explode(array(
          struct(lit("pk_and_sk").as("predicate"), prunedBoth.as("pruned"),
            col("n_match").as("matched")),
          struct(lit("sk_only").as("predicate"), prunedSk.as("pruned"),
            col("n_match_sk").as("matched")))).as("pv"))
      .groupBy(col("layout"), col("pv.predicate").as("predicate"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("pv.pruned"), 1L).otherwise(0L)).as("n_pruned"),
        sum(when(col("pv.pruned"), 0L).otherwise(col("n"))).as("rows_scanned"),
        sum(col("pv.matched")).as("rows_matched"))
  }
}
