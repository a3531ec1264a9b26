package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTrend

/** Replay-agreement pins for the streaming OLS-trend twin: the
  * six-long moment state must reproduce the batch `a_trend` row
  * exactly after an ordered multi-batch replay (the first-day-is-min-
  * day premise), and cross-batch disorder must fail loudly. */
class StreamingTrendSpec extends SparkSpec {
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

  /** 90 events over 3 types spanning ~30 days, strictly increasing
    * ts, value trending differently per type. */
  private def eventRows: Seq[(Long, java.sql.Timestamp, Long, String, Double)] =
    (0 until 90).map { i =>
      val t = Seq("view", "click", "error")(i % 3)
      val day = i / 3
      ((1000 + i).toLong,
        new java.sql.Timestamp(1700000000000L + day * 86400000L + i * 1000L),
        (i % 7).toLong, t,
        (i % 3) match {
          case 0 => 10.0 + day * 0.5 + (i % 5) * 0.07
          case 1 => 40.0 - day * 0.25 + (i % 4) * 0.11
          case _ => 5.0 + (i % 6) * 0.13
        })
    }

  test("streaming trend equals the batch regression after an ordered replay") {
    withRocksDB {
      val rows = eventRows
      val dir = java.nio.file.Files.createTempDirectory("trend-fixture").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("a_trend")(spark, dir)
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val out = StreamingTrend.trend(input.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      val q = out.writeStream.format("memory").queryName("trend_stream")
        .outputMode("append").start()
      try {
        rows.grouped(25).foreach { slice =>
          input.addData(slice); q.processAllAvailable()
        }
        // the LAST emission per type is the full-history trend
        val got = spark.table("trend_stream")
          .as[(String, Long, Double, Double)].collect()
          .groupBy(_._1).map { case (k, rs) =>
            val last = rs.maxBy(_._2); k -> ((last._2, last._3, last._4))
          }
        assert(got === batch,
          "ordered replay's final rows must equal the batch a_trend regression")
      } finally q.stop()
    }
  }

  test("trend state stays six moments: mid-replay emissions are prefix regressions") {
    withRocksDB {
      val rows = eventRows.filter(_._4 == "view")
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val out = StreamingTrend.trend(input.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      val q = out.writeStream.format("memory").queryName("trend_prefix")
        .outputMode("append").start()
      try {
        val (h1, h2) = rows.splitAt(rows.size / 2)
        input.addData(h1); q.processAllAvailable()
        // the prefix emission must equal a batch regression over the prefix
        val dir = java.nio.file.Files.createTempDirectory("trend-prefix").toString
        h1.toDF("event_id", "ts", "user_id", "event_type", "value")
          .withColumn("props", lit("{}"))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        val expect = SparkEntry.queries("a_trend")(spark, dir)
          .as[(String, Long, Double, Double)].collect().head
        val got = spark.table("trend_prefix")
          .as[(String, Long, Double, Double)].collect().maxBy(_._2)
        assert(got === expect, "mid-replay emission must be the prefix regression")
        input.addData(h2); q.processAllAvailable()
      } finally q.stop()
    }
  }

  test("cross-batch disorder fails the trend query loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val out = StreamingTrend.trend(input.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      val q = out.writeStream.format("memory").queryName("trend_disorder")
        .outputMode("append").start()
      try {
        input.addData(Seq(
          (1L, new java.sql.Timestamp(1700000100000L), 1L, "view", 1.0)))
        q.processAllAvailable()
        input.addData(Seq(
          (2L, new java.sql.Timestamp(1700000000000L), 1L, "view", 2.0)))
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(ex.getMessage.contains("in-order") ||
          Option(ex.getCause).exists(_.getMessage.contains("in-order")))
      } finally q.stop()
    }
  }
}
