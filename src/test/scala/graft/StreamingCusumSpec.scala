package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingCusum

/** Replay-agreement pins for the streaming CUSUM twin: the four-long
  * (P, min P, Q, min Q) state must reproduce the batch closed-form
  * rows exactly across micro-batch seams, and out-of-order closed
  * days must fail loudly. */
class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

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

  /** The batch operator's own daily frame and calibrated means. */
  private def dailyAndMu = {
    val daily = SparkEntry.T(spark, dir, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 10000) AS BIGINT)").as("v_fx"))
      .groupBy("event_type", "day").agg(sum("v_fx").as("x_fx"))
    val mu = daily.groupBy("event_type")
      .agg(expr("sum(x_fx) div count(1)").as("mu"))
      .as[(String, Long)].collect().toMap
    (daily, mu)
  }

  test("streaming CUSUM equals the batch closed form after an ordered replay") { withRocksDB {
    val (daily, mu) = dailyAndMu
    val rows = daily.select(col("event_type"), col("day"), col("x_fx"))
      .as[(String, Long, Long)].collect().sortBy(r => (r._2, r._1)).toSeq
    val batch = SparkEntry.queries("a_cusum")(spark, dir)
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val out = StreamingCusum.cusum(
      input.toDF().toDF("event_type", "day", "x_fx"), mu)
    val q = out.writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      // split mid-series so every type's fold crosses micro-batch seams
      rows.grouped(7).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
      val got = spark.table("cusum_stream")
        .as[(String, Long, Long, Long, Long, Boolean, Boolean)]
        .collect().toSet
      assert(got === batch, "ordered replay must reproduce the batch rows")
      assert(got.nonEmpty)
    } finally q.stop()
  } }

  test("an out-of-order closed day fails loudly instead of corrupting the fold") { withRocksDB {
    val (_, mu) = dailyAndMu
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val out = StreamingCusum.cusum(
      input.toDF().toDF("event_type", "day", "x_fx"), mu)
    val q = out.writeStream.format("memory").queryName("cusum_disorder")
      .outputMode("append").start()
    try {
      input.addData(("view", 20000L, 1000L))
      q.processAllAvailable()
      input.addData(("view", 19999L, 900L)) // regressing day
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("arrived after") ||
        Option(ex.getCause).exists(_.getMessage.contains("arrived after")))
    } finally q.stop()
  } }
}
