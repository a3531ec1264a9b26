package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingBackfill

/** Pins for the interpolation REPAIR twin of a_gap_fill: corrections
  * land the moment the right anchor arrives, carry the provisional
  * value they supersede plus the signed delta, equal the batch
  * interp_fx column on each series' observed span, and day disorder
  * fails loudly. */
class StreamingBackfillSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDB(body: => Unit): Unit = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  private def replay(rows: Seq[(String, Long, Long)],
      name: String): Set[(String, Long, Long, Long, Long, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingBackfill.repairs(
        input.toDF().toDF("event_type", "day", "v_fx"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(2).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
      spark.table(name).as[(String, Long, Long, Long, Long, Boolean)]
        .collect().toSet
    } finally q.stop()
  }

  test("gap days repair with the interpolated value and its delta") {
    withRocksDB {
      // A: 10→5, 13→11: interp(11) = 5 + 6*(1/3) = 7, interp(12) = 9
      val got = replay(Seq(("A", 10L, 5L), ("B", 11L, 2L), ("A", 13L, 11L)),
        "backfill_hand")
      assert(got === Set(
        ("A", 10L, 5L, 5L, 0L, false),
        ("A", 11L, 7L, 5L, 2L, true),
        ("A", 12L, 9L, 5L, 4L, true),
        ("A", 13L, 11L, 11L, 0L, false),
        ("B", 11L, 2L, 2L, 0L, false)))
    }
  }

  test("rounding is HALF_UP at the emitted value, matching the batch") {
    withRocksDB {
      // 0→0, 2→1: interp(1) = round(0.5) = 1
      val got = replay(Seq(("C", 0L, 0L), ("C", 2L, 1L)), "backfill_round")
      assert(got.contains(("C", 1L, 1L, 0L, 1L, true)))
    }
  }

  test("replay equals the batch a_gap_fill interp column on each observed span") {
    withRocksDB {
      val dir = "/root/testdata/sf0.01"
      val obs = SparkEntry.T(spark, dir, "events")
        .filter(col("value") > 300.0)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          expr("CAST(round(value * 10000) AS BIGINT)").as("v_fx"))
        .groupBy("event_type", "day").agg(max(col("v_fx")).as("v_fx"))
        .as[(String, Long, Long)].collect().sortBy(r => (r._2, r._1)).toSeq
      val span = obs.groupBy(_._1).map { case (k, rs) =>
        k -> ((rs.map(_._2).min, rs.map(_._2).max)) }
      val batch = SparkEntry.queries("a_gap_fill")(spark, dir)
        .select(col("event_type"), col("day"), col("interp_fx"), col("is_gap"))
        .as[(String, Long, Option[Long], Boolean)].collect()
        .filter(r => span.get(r._1).exists { case (lo, hi) => r._2 >= lo && r._2 <= hi })
        .map(r => (r._1, r._2, r._3.get, r._4))
        .toSet
      val streamed = replay(obs, "backfill_sf")
        .map(r => (r._1, r._2, r._3, r._6))
      assert(streamed === batch)
      assert(batch.count(_._4) > 0, "the pin must exercise repaired gap days")
    }
  }

  test("a regressing day fails loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val q = StreamingBackfill.repairs(
          input.toDF().toDF("event_type", "day", "v_fx"))
        .writeStream.format("memory").queryName("backfill_disorder")
        .outputMode("append").start()
      try {
        input.addData(Seq(("A", 10L, 5L))); q.processAllAvailable()
        input.addData(Seq(("A", 9L, 4L)))
        val ex = intercept[Exception](q.processAllAvailable())
        assert(ex.getMessage != null)
      } finally q.stop()
    }
  }
}
