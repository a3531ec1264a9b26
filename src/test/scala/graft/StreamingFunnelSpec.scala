package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingFunnel

/** Replay-agreement pins for the streaming funnel twin: final per-user
  * depths must reproduce the batch a_funnel histogram on an ordered
  * replay of the fixture, transitions must be monotone, and the
  * strict-order/window rules must match the batch semantics. */
class StreamingFunnelSpec extends SparkSpec {
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

  test("ordered fixture replay reproduces the batch funnel histogram") {
    withRocksDB {
      val dir = "/root/testdata/sf0.001"
      val batch = SparkEntry.queries("a_funnel")(spark, dir)
        .as[(Long, Long)].collect().toMap
      val ev = SparkEntry.T(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val nUsers = ev.select("user_id").distinct().count()
      val rows = ev
        .orderBy(col("ts"), col("event_id"))
        .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val out = StreamingFunnel.funnel(
        input.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        21600000000L) // 6 hours in micros — the batch window
      val q = out.writeStream.format("memory").queryName("funnel_stream")
        .outputMode("append").start()
      try {
        rows.grouped(400).foreach { slice =>
          input.addData(slice)
          q.processAllAvailable()
        }
        val steps = spark.table("funnel_stream")
          .as[(Long, Int, Long)].collect().toSeq
        // transitions are monotone 1,2,3 per user with increasing ts
        steps.groupBy(_._1).foreach { case (u, ss) =>
          val byDepth = ss.sortBy(_._2)
          assert(byDepth.map(_._2) === (1 to byDepth.length),
            s"user $u transitions not monotone: $ss")
          assert(byDepth.map(_._3) === byDepth.map(_._3).sorted,
            s"user $u depth timestamps not increasing")
        }
        // final-depth histogram equals the batch funnel's
        val finalDepth = steps.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        val gotHist = finalDepth.values.groupBy(identity)
          .map { case (d, vs) => d.toLong -> vs.size.toLong }
        val withZero = gotHist + (0L -> (nUsers - finalDepth.size))
        assert(withZero.filter(_._2 > 0) === batch.filter(_._2 > 0),
          s"streaming final depths must equal the batch histogram")
      } finally q.stop()
    }
  }

  test("windowed conversion report equals a_funnel_hourly once windows close") {
    withRocksDB {
      val dir = "/root/testdata/sf0.001"
      val batch = SparkEntry.queries("a_funnel_hourly")(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      val ev = SparkEntry.T(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val rows = ev.orderBy(col("ts"), col("event_id"))
        .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
      val maxUs = rows.map(_._2.getTime).max * 1000L

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val out = graft.streaming.Pipeline.funnelHourly(
        input.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        21600000000L, "10 minutes")
      val q = out.writeStream.format("memory").queryName("funnel_hourly")
        .outputMode("append").start()
      try {
        rows.grouped(500).foreach { slice =>
          input.addData(slice); q.processAllAvailable()
        }
        // push the watermark past every fixture window with a
        // sentinel view from a user the fixture never saw
        input.addData(Seq((999999L,
          new java.sql.Timestamp(maxUs / 1000L + 86400000L), 999999L, "view")))
        q.processAllAvailable()
        val got = spark.table("funnel_hourly")
          .as[(Long, Long, Long)].collect().toSet
          .filter(_._1 <= maxUs) // the sentinel's own window stays open
        assert(got === batch,
          "closed windows must carry exactly the batch per-hour step counts")
      } finally q.stop()
    }
  }

  test("strict order and window rules match batch: pre-view click never counts") {
    withRocksDB {
      val t0 = 1700000000000L
      def ts(offMin: Long) = new java.sql.Timestamp(t0 + offMin * 60000L)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val out = StreamingFunnel.funnel(
        input.toDF().toDF("user_id", "ts", "event_id", "event_type"), 21600000000L)
      val q = out.writeStream.format("memory").queryName("funnel_rules")
        .outputMode("append").start()
      try {
        input.addData(Seq(
          (2L, ts(0), 201L, "click"), (2L, ts(60), 202L, "view"),   // click precedes view
          (3L, ts(0), 301L, "view"), (3L, ts(420), 302L, "click"))) // click outside 6h
        q.processAllAvailable()
        val got = spark.table("funnel_rules").as[(Long, Int, Long)].collect().toSet
        assert(got.map(r => (r._1, r._2)) === Set((2L, 1), (3L, 1)),
          s"both users must stall at depth 1: $got")
      } finally q.stop()
    }
  }
}
