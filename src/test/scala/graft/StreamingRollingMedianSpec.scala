package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingRollingMedian

/** Replay-agreement pins for the streaming rolling median: the
  * 15-pair frame state must reproduce the batch bounded-window rows
  * exactly across micro-batch seams (including seams INSIDE a frame),
  * and day disorder fails loudly. */
class StreamingRollingMedianSpec extends SparkSpec {
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

  test("streaming rolling median equals the batch bounded window after an ordered replay") {
    withRocksDB {
      val dir = "/root/testdata/sf0.001"
      val daily = SparkEntry.T(spark, dir, "events")
        .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
          expr("CAST(round(value * 10000) AS BIGINT)").as("v_fx"))
        .groupBy("event_type", "day").agg(sum("v_fx").as("x"))
      val rows = daily.as[(String, Long, Long)].collect()
        .sortBy(r => (r._2, r._1)).toSeq
      val batch = SparkEntry.queries("a_rolling_median")(spark, dir)
        .as[(String, Long, Long, Long, Long)].collect().toSet

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val out = StreamingRollingMedian.rollingMedian(
        input.toDF().toDF("event_type", "day", "x"))
      val q = out.writeStream.format("memory").queryName("rollmed_stream")
        .outputMode("append").start()
      try {
        // slices of 35 (~7 days of the 5 interleaved series) still put
        // ~2 micro-batch seams inside each series' 15-row frame; the
        // old 7-row slices ran ~100 micro-batches (~60 s of the suite)
        // for the same cross-batch property (r15)
        rows.grouped(35).foreach { slice =>
          input.addData(slice); q.processAllAvailable()
        }
        val got = spark.table("rollmed_stream")
          .as[(String, Long, Long, Long, Long)].collect().toSet
        assert(got === batch)
        assert(batch.exists(_._4 == 15L), "some frames must reach the 15-row bound")
      } finally q.stop()
    }
  }

  test("a regressing day fails loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val q = StreamingRollingMedian.rollingMedian(
          input.toDF().toDF("event_type", "day", "x"))
        .writeStream.format("memory").queryName("rollmed_disorder")
        .outputMode("append").start()
      try {
        input.addData(("A", 20L, 5L)); q.processAllAvailable()
        input.addData(("A", 20L, 6L)) // same day again
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(ex.getMessage.contains("arrived after") ||
          Option(ex.getCause).exists(_.getMessage.contains("arrived after")))
      } finally q.stop()
    }
  }
}
