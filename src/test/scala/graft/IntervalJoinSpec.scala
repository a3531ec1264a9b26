package graft

import org.apache.spark.sql.functions._
import graft.ops.IntervalJoin

/** Pins for the bucketed interval-overlap join: row-for-row equality
  * with the naive inequality join (the DuckDB oracle's form),
  * exactly-once emission across multi-bucket overlaps, and the loud
  * fan-out cap. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    l.join(r, col("ls") <= col("re") && col("rs") <= col("le"))

  test("equals the naive inequality join on boundary-heavy fixtures") {
    // touching endpoints (inclusive bounds overlap), nested, disjoint,
    // multi-bucket spans, exact bucket-boundary starts
    val l = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 35L, 36L),
        (4L, 0L, 99L), (5L, 40L, 40L))
      .toDF("lid", "ls", "le")
    val r = Seq((101L, 10L, 12L), (102L, 30L, 50L), (103L, 200L, 210L),
        (104L, 0L, 0L))
      .toDF("rid", "rs", "re")
    for (w <- Seq(1L, 7L, 10L, 1000L)) {
      val got = IntervalJoin.overlap(l, "ls", "le", r, "rs", "re", w)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val want = naive(l, r).select("lid", "rid")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got === want, s"divergence at bucketWidth=$w")
    }
  }

  test("a pair sharing many buckets is emitted exactly once") {
    val l = Seq((1L, 0L, 95L)).toDF("lid", "ls", "le")
    val r = Seq((2L, 5L, 90L)).toDF("rid", "rs", "re")
    val got = IntervalJoin.overlap(l, "ls", "le", r, "rs", "re", 10L).collect()
    assert(got.length === 1, s"anchor-bucket uniqueness broken: ${got.length} rows")
  }

  test("an interval spanning more buckets than the cap fails loudly") {
    val l = Seq((1L, 0L, 1000L)).toDF("lid", "ls", "le")
    val r = Seq((2L, 0L, 1L)).toDF("rid", "rs", "re")
    val e = intercept[Exception] {
      IntervalJoin.overlap(l, "ls", "le", r, "rs", "re", 10L,
        maxBucketsPerInterval = 50).collect()
    }
    assert(e.getMessage != null)
  }

  test("overlapLen clamps to the intersection") {
    val df = Seq((0L, 10L, 5L, 20L)).toDF("ls", "le", "rs", "re")
      .select(IntervalJoin.overlapLen(col("ls"), col("le"),
        col("rs"), col("re")).as("o"))
    assert(df.as[Long].head() === 5L)
  }
}
