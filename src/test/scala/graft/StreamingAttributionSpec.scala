package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingAttribution

/** Replay-agreement pins for the streaming bounded-attribution twin:
  * an ordered replay must reproduce the batch `a_attribution_bounded`
  * rows exactly — including purchases whose in-window views overflow
  * the 8-view state bound, views aged out of the 6h window but still
  * in state, and purchases with no views at all — and cross-batch
  * disorder must fail loudly. */
class StreamingAttributionSpec extends SparkSpec {
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

  private val t0 = 1700000000000L // ms
  private val hour = 3600000L

  /** (event_id, ts, user_id, event_type); strictly increasing ts.
    *  - user 1: 12 views in-window, then a purchase (cap bites: 8)
    *  - user 2: 2 early views that AGE OUT of the 6h window by its
    *    late purchase (they remain in state — the on-read filter must
    *    drop them), 3 fresh views, a purchase, then another purchase
    *    with only the same 3 (still-fresh) views
    *  - user 3: a purchase with no views at all (null touches) */
  private def eventRows: Seq[(Long, java.sql.Timestamp, Long, String)] = {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val u1 = (0 until 12).map(i =>
      (100L + i, ts(t0 + i * 60000L), 1L, "view")) :+
      (150L, ts(t0 + 13 * 60000L), 1L, "purchase")
    val u2 = Seq(
      (200L, ts(t0 + 1000L), 2L, "view"),
      (201L, ts(t0 + 2000L), 2L, "view"),
      (210L, ts(t0 + 7 * hour), 2L, "view"),
      (211L, ts(t0 + 7 * hour + 60000L), 2L, "view"),
      (212L, ts(t0 + 7 * hour + 120000L), 2L, "view"),
      (250L, ts(t0 + 7 * hour + 180000L), 2L, "purchase"),
      (251L, ts(t0 + 8 * hour), 2L, "purchase"))
    val u3 = Seq((300L, ts(t0 + 3000L), 3L, "purchase"))
    (u1 ++ u2 ++ u3).sortBy(e => (e._2.getTime, e._1))
  }

  private def batchExpected: Map[Long, (Long, Long, Option[Long], Option[Long], Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("attr-fixture").toString
    eventRows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("a_attribution_bounded")(spark, dir)
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
  }

  test("ordered multi-batch replay reproduces the batch bounded attribution exactly") {
    withRocksDB {
      val batch = batchExpected
      assert(batch(150L)._5 === 8L, "fixture must overflow the view cap")
      assert(batch(250L)._5 === 3L, "aged-out views must not count")
      assert(batch(300L)._5 === 0L, "view-less purchase must attribute empty")

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val out = StreamingAttribution.attribution(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      val q = out.writeStream.format("memory").queryName("attr_stream")
        .outputMode("append").start()
      try {
        // three ordered slices — view accumulation spans batch seams
        eventRows.grouped(8).foreach { slice =>
          input.addData(slice)
          q.processAllAvailable()
        }
        val got = spark.table("attr_stream")
          .as[(Long, Long, Long, Option[Long], Option[Long], Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
        assert(got.size === 4, s"one row per purchase: $got")
        assert(got === batch,
          "ordered replay must reproduce the batch bounded attribution")
      } finally q.stop()
    }
  }

  test("cross-batch disorder fails the query loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val out = StreamingAttribution.attribution(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      val q = out.writeStream.format("memory").queryName("attr_disorder")
        .outputMode("append").start()
      try {
        input.addData(Seq((2L, new java.sql.Timestamp(t0 + 60000L), 1L, "view")))
        q.processAllAvailable()
        input.addData(Seq((1L, new java.sql.Timestamp(t0), 1L, "view")))
        val e = intercept[Exception] { q.processAllAvailable() }
        def messages(t: Throwable): List[String] =
          if (t == null) Nil
          else Option(t.getMessage).toList ::: messages(t.getCause)
        assert(messages(e).exists(_.contains("arrived after")), s"got: $e")
      } finally q.stop()
    }
  }
}
