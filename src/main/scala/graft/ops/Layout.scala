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
    * numerators here are ≤ 2^53 (rn·buckets with rn computed in LONG —
    * exactly representable; 6e11 rows × 64 buckets ≈ 2^45) and the
    * true quotient is never within one double ulp below an integer
    * (the nearest possible gap is 1/divisor; even at divisor = 6e11
    * that is ~1.6e-12 while the quotient's ulp at magnitude ≤ buckets
    * is ~1e-14), so the cast truncates the same way. */
  private def idiv(a: Column, b: Column): Column = (a / b).cast("long")

  /** One-row 16-bit precondition gate for [[zValue]]: evaluates to
    * null (row kept) when both maxima fit 16 bits, throws otherwise —
    * spread16 masks to the low 16 bits, so keys above 65535 would
    * silently alias and the co-location bound the report prices would
    * be meaningless. Wired as a filter on broadcast-frame columns so
    * column pruning cannot drop it; two long compares per row against
    * broadcast constants, codegen'd. */
  private def guard16(mxA: Column, mxB: Column): Column =
    assert_true(mxA <= 65535L && mxB <= 65535L,
      lit("Layout.zValue precondition violated: a z-order key exceeds " +
        "16 bits (65535); widen spread16 to a 32-bit-per-dimension " +
        "spread before using this layout")).isNull

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
    val n = zf.agg(count(lit(1)).as("n_total"),
      max(col("l_partkey")).as("_mx_a"), max(col("l_suppkey")).as("_mx_b"))
    zf.crossJoin(broadcast(n))
      .filter(guard16(col("_mx_a"), col("_mx_b")))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))))
      .select(col("l_partkey"), col("l_suppkey"),
        idiv((col("rn") - 1).cast("long") * buckets, col("n_total")).as("bucket"))
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
      .filter(guard16(col("max_pk"), col("max_sk")))
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
      .withColumn("bucket",
        idiv((col("rn") - 1).cast("long") * buckets, col("n_total")))
      .groupBy(col("lb.layout").as("layout"), col("bucket"))
      .agg(bucketStats.head, bucketStats.tail: _*)
    priceBuckets(perBucket)
  }

  /** The per-(layout, bucket) file statistics both report forms
    * aggregate: row count, min/max of each predicate column, the two
    * predicate match counts, and the (constant-per-group, broadcast
    * one-row) predicate bounds carried through with min. */
  private val bucketStats: Seq[Column] = Seq(
    count(lit(1)).as("n"),
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

  /** Prices a per-(layout, bucket) stats frame against the two query
    * shapes: the 2-D rectangle and a suppkey-only range — the
    * single-dimension probe is where a single-key layout collapses
    * (scans everything) while Z-order still prunes on BOTH
    * dimensions; that robustness across predicate mixes is the reason
    * to pay for the Z-order rewrite. */
  private def priceBuckets(perBucket: DataFrame): DataFrame = {
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

  /** 100 TB production form of [[zorderHist]]: the equal-count file
    * cut runs as `repartitionByRange(buckets, z, …)` — a sampled-
    * boundary range shuffle, every partition writing its own file
    * stats in parallel — instead of a global row_number window that
    * funnels the whole table through ONE task. Per-file stats are a
    * partial-agg'd groupBy on `spark_partition_id()` (each range
    * partition reduces to one row map-side; the second shuffle moves
    * `buckets` rows). File sizes are approximately equal (reservoir-
    * sampled boundaries, not exact ranks) — which is exactly what a
    * real rewrite produces — so this twin is report-pinned against
    * the exact form (LayoutSpec: rows conserved, z-ranges disjoint
    * across files, same pruning behavior), not oracle-hashed.
    * Emits min_z/max_z per file as well: range partitioning
    * guarantees the z intervals are pairwise disjoint — the
    * co-location property itself, pinned by spec. */
  def zorderHistRange(lineitem: DataFrame, buckets: Int): DataFrame = {
    val mx = lineitem.agg(
      max(col("l_partkey")).as("_mx_a"), max(col("l_suppkey")).as("_mx_b"))
    lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"))
      .crossJoin(broadcast(mx))
      .filter(guard16(col("_mx_a"), col("_mx_b")))
      .withColumn("z", zValue(col("l_partkey"), col("l_suppkey")))
      .repartitionByRange(buckets, col("z"), col("l_orderkey"), col("l_linenumber"))
      .groupBy(spark_partition_id().as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"),
        min("z").as("min_z"), max("z").as("max_z"))
  }

  /** 100 TB production form of [[skippingReport]]: each candidate
    * layout is priced with its own `repartitionByRange` pass over the
    * projected 4-column frame — three narrow range shuffles, each
    * fully parallel — instead of the exact form's per-layout global
    * window (a full-table sort through one task per layout). Same
    * stats, same pricing tail, same output schema; bucket boundaries
    * are sampled rather than exact ranks, so the twin is
    * report-pinned (LayoutSpec: rows_matched identical to the exact
    * form — match counts are bucketing-independent — rows conserved,
    * pruning at least as selective as scanning everything). */
  def skippingReportRange(lineitem: DataFrame, buckets: Int): DataFrame = {
    val mx = lineitem.agg(
      max(col("l_partkey")).as("max_pk"),
      max(col("l_suppkey")).as("max_sk"))
    val base = lineitem.crossJoin(broadcast(mx))
      .filter(guard16(col("max_pk"), col("max_sk")))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"),
        (col("max_pk") / 10).cast("long").as("p_lo"),
        (col("max_pk") / 5).cast("long").as("p_hi"),
        (col("max_sk") / 10).cast("long").as("s_lo"),
        (col("max_sk") / 5).cast("long").as("s_hi"))
    def layoutStats(name: String, skey: Column): DataFrame =
      base.withColumn("skey", skey)
        .repartitionByRange(buckets, col("skey"), col("l_orderkey"),
          col("l_linenumber"))
        .groupBy(spark_partition_id().as("bucket"))
        .agg(bucketStats.head, bucketStats.tail: _*)
        .withColumn("layout", lit(name))
    val perBucket =
      layoutStats("zorder", zValue(col("l_partkey"), col("l_suppkey")))
        .unionByName(layoutStats("partkey", col("l_partkey")))
        .unionByName(layoutStats("orderkey", col("l_orderkey")))
    priceBuckets(perBucket)
  }

  /** Partition-skew advisor over per-partition row counts (`grp`,
    * `n_part_rows` — one row per physical partition of a declared
    * partitioning scheme): per group, partition count, total rows, the
    * fattest partition, its skew versus the group mean in exact e4
    * (max·n_parts·10⁴ div n_rows — mean-based so no order statistics,
    * every term a long), a hot flag at the 2×-mean cut, and the salt
    * factor a writer would shard the hot key by (⌈max·n_parts /
    * n_rows⌉, the smallest split count that brings the fattest
    * partition back to the mean). Shape: one partial-agg pass over the
    * partition-count frame, output bounded by the group vocabulary —
    * exactly what an operator reads before keying a 100 TB shuffle. */
  def partitionSkew(partCounts: DataFrame): DataFrame =
    partCounts.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("n_part_rows")).as("n_rows"),
        max(col("n_part_rows")).as("max_part_rows"))
      .select(col("grp"), col("n_parts"), col("n_rows"), col("max_part_rows"),
        expr("max_part_rows * n_parts * 10000 div n_rows").as("skew_x_mean_e4"),
        expr("max_part_rows * n_parts > 2 * n_rows").as("hot"),
        when(expr("max_part_rows * n_parts > 2 * n_rows"),
          expr("(max_part_rows * n_parts + n_rows - 1) div n_rows"))
          .otherwise(lit(1L)).as("salt_factor"))

  /** Compaction planner over a per-file frame (`grp`, `n_rows`,
    * `est_bytes` — one row per current file of a declared layout): per
    * group, the file census (count, rows, bytes, how many fall under
    * the small-file threshold) and the rewrite target — the
    * ⌈bytes/targetBytes⌉ file count (min 1) a compactor passes to
    * repartition(n), with the resulting merge factor. All exact
    * integer arithmetic; one partial-agg pass, group-bounded output.
    * The small-files soup this plans away is THE dominant metadata
    * tax on a 100 TB lake (every query pays listing + footer reads per
    * file). */
  def compactionPlan(files: DataFrame, targetBytes: Long,
      smallBytes: Long): DataFrame =
    files.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("est_bytes")).as("est_bytes"),
        sum(when(col("est_bytes") < smallBytes, 1L).otherwise(0L))
          .as("n_small"))
      .select(col("grp"), col("n_files"), col("n_rows"), col("est_bytes"),
        col("n_small"),
        greatest(lit(1L), expr(s"(est_bytes + ${targetBytes - 1}L) div ${targetBytes}L"))
          .as("n_files_target"))
      .withColumn("merge_factor", expr("n_files div n_files_target"))
}
