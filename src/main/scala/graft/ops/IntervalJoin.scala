package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join — the join family member Spark has no native
  * operator for: pairs (l, r) with `l.start <= r.end AND
  * r.start <= l.end`, no equi-key anywhere (a_range_join's residual
  * rides an orderkey equi-join; here the INTERVALS are the only
  * relationship). The naive form is a cartesian product; the scale
  * shape is the standard bucketed rewrite (the banded-LSH argument
  * applied to time): explode each interval into the fixed-width
  * buckets it covers, equi-join on the bucket, verify true overlap on
  * the candidates — shuffle is bucket-keyed and candidate fan-out is
  * bounded by bucket width × interval length, never |L|×|R|.
  */
object IntervalJoin {

  /** Bucketed overlap join of `left` and `right` on
    * [`lStart`,`lEnd`] × [`rStart`,`rEnd`] (inclusive long bounds,
    * e.g. epoch micros). Returns all columns of both inputs (caller
    * guarantees disjoint names), one row per OVERLAPPING pair,
    * exactly once: a pair sharing k covering buckets is kept only in
    * the anchor bucket `greatest(l.start, r.start) div bucketWidth` —
    * that instant lies in both intervals, so both sides generated the
    * bucket, and it is unique per pair; no distinct, no dedup
    * shuffle (the simhash capped-band convention).
    *
    * `maxBucketsPerInterval` is the declared fan-out cap (the DfCap
    * convention): an interval longer than cap × bucketWidth fails
    * LOUDLY instead of silently exploding the bucket frame — at
    * 100 TB an unbounded interval (a forever-open session) is a data
    * bug the join must surface, not absorb. Pick bucketWidth near the
    * typical interval length: candidates per pair stay O(1) and the
    * bucket key is time-uniform, so the shuffle has no hot key beyond
    * genuinely hot time ranges (salt the bucket with a right-side id
    * suffix if one window matches everything).
    */
  def overlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    def buckets(df: DataFrame, s: String, e: String): DataFrame = df
      .withColumn("_graft_bks", expr(s"sequence($s div ${bucketWidth}L, $e div ${bucketWidth}L)"))
      .filter(assert_true(size(col("_graft_bks")) <= maxBucketsPerInterval,
        lit(s"IntervalJoin.overlap: an interval spans more than " +
          s"$maxBucketsPerInterval buckets of $bucketWidth — widen bucketWidth " +
          "or fix the runaway interval")).isNull)
      .withColumn("_graft_bk", explode(col("_graft_bks")))
      .drop("_graft_bks")
    val lb = buckets(left, lStart, lEnd)
    val rb = buckets(right, rStart, rEnd).withColumnRenamed("_graft_bk", "_graft_bk_r")
    lb.join(rb, lb("_graft_bk") === rb("_graft_bk_r"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // anchor-bucket uniqueness: keep the pair only where the bucket
      // equals the overlap start's bucket
      .filter(col("_graft_bk") ===
        expr(s"greatest($lStart, $rStart) div ${bucketWidth}L"))
      .drop("_graft_bk", "_graft_bk_r")
  }

  /** Overlap length in the inputs' units (inclusive bounds → +1-free
    * convention left to the caller; this is the raw clamp). */
  def overlapLen(lStart: Column, lEnd: Column, rStart: Column, rEnd: Column): Column =
    least(lEnd, rEnd) - greatest(lStart, rStart)
}
