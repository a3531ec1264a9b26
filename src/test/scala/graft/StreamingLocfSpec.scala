package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingLocf

/** Replay-agreement pins for the streaming LOCF gap-filler: skipped
  * calendar days are emitted with the carried value the moment the
  * gap closes, the replay equals the batch a_gap_fill LOCF column on
  * each series' observed span, and day disorder fails loudly. */
class StreamingLocfSpec extends SparkSpec {
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
      name: String): Set[(String, Long, Long, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamingLocf.locf(input.toDF().toDF("event_type", "day", "v_fx"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(2).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
      spark.table(name).as[(String, Long, Long, Boolean)].collect().toSet
    } finally q.stop()
  }

  test("gap days emit the carried value when the gap closes") { withRocksDB {
    val got = replay(Seq(("A", 10L, 5L), ("B", 11L, 2L), ("A", 13L, 7L)),
      "locf_hand")
    assert(got === Set(
      ("A", 10L, 5L, false), ("A", 11L, 5L, true), ("A", 12L, 5L, true),
      ("A", 13L, 7L, false), ("B", 11L, 2L, false)))
  } }

  test("replay equals the batch a_gap_fill LOCF column on each observed span") {
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
        .select(col("event_type"), col("day"), col("locf_fx"), col("is_gap"))
        .as[(String, Long, Option[Long], Boolean)].collect()
        .filter(r => span.get(r._1).exists { case (lo, hi) => r._2 >= lo && r._2 <= hi })
        .map(r => (r._1, r._2, r._3.get, r._4))
        .toSet
      assert(replay(obs, "locf_sf") === batch)
      assert(batch.nonEmpty)
    }
  }

  test("a regressing day fails loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long, Long)]
      val q = StreamingLocf.locf(input.toDF().toDF("event_type", "day", "v_fx"))
        .writeStream.format("memory").queryName("locf_disorder")
        .outputMode("append").start()
      try {
        input.addData(("A", 20L, 1L)); q.processAllAvailable()
        input.addData(("A", 19L, 1L))
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(ex.getMessage.contains("arrived after") ||
          Option(ex.getCause).exists(_.getMessage.contains("arrived after")))
      } finally q.stop()
    }
  }
}
