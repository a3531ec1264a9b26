package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.StreamingStreaks

/** Replay pins for the streaming streak tracker: streaks close (and
  * emit) exactly when a gap proves them over, replay agrees with the
  * batch gaps-and-islands decomposition on every CLOSED streak, same-
  * day redelivery is idempotent, and regression fails loudly. */
class StreamingStreaksSpec extends SparkSpec {
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

  private def replay(rows: Seq[(Long, Long)], name: String,
      per: Int = 3): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = StreamingStreaks.closedStreaks(
        input.toDF().toDF("user_id", "day"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(per).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
      spark.table(name).as[(Long, Long, Long, Long)].collect().toSet
    } finally q.stop()
  }

  test("a streak closes when the gap day arrives, and only then") {
    withRocksDB {
      val got = replay(Seq((1L, 10L), (1L, 11L), (1L, 11L), (1L, 12L),
        (1L, 15L), (2L, 5L), (2L, 9L)), "streaks_hand")
      // user 1: [10..12] closed by 15; [15..] still open.
      // user 2: [5] closed by 9; [9] still open.
      assert(got === Set((1L, 10L, 12L, 3L), (2L, 5L, 5L, 1L)))
    }
  }

  test("replay agrees with the batch islands on every closed streak") {
    withRocksDB {
      val dir = "/root/testdata/sf0.001"
      val days = SparkEntry.T(spark, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val islands = days
        .withColumn("grp", col("day") - dense_rank().over(w))
        .groupBy("user_id", "grp")
        .agg(min("day").as("start_day"), max("day").as("end_day"),
          count(lit(1)).as("len"))
      val lastStart = islands.groupBy("user_id")
        .agg(max("start_day").as("start_day"))
      val closed = islands.join(lastStart, Seq("user_id", "start_day"),
          "left_anti")
        .select("user_id", "start_day", "end_day", "len")
        .as[(Long, Long, Long, Long)].collect().toSet
      // 30-row slices: rows arrive sorted by (day, user), so every
      // user's streaks still cross many micro-batch seams; the old
      // 3-row slices ran ~300 micro-batches (~60 s of the suite) for
      // the same cross-batch property (r15)
      val obs = days.as[(Long, Long)].collect().sortBy(r => (r._2, r._1)).toSeq
      assert(replay(obs, "streaks_sf", per = 30) === closed)
      assert(closed.nonEmpty, "the pin must exercise closed streaks")
    }
  }

  test("a regressing day fails loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long)]
      val q = StreamingStreaks.closedStreaks(
          input.toDF().toDF("user_id", "day"))
        .writeStream.format("memory").queryName("streaks_disorder")
        .outputMode("append").start()
      try {
        input.addData(Seq((1L, 10L))); q.processAllAvailable()
        input.addData(Seq((1L, 8L)))
        val ex = intercept[Exception](q.processAllAvailable())
        assert(ex.getMessage != null)
      } finally q.stop()
    }
  }
}
