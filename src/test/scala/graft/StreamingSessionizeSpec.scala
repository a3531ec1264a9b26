package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSessionize

/** Replay-agreement pins for the streaming sessionize twin: on an
  * ordered multi-batch replay the emitted (closed) sessions must equal
  * the batch [[graft.ops.Sessionize]] rows minus each user's final
  * still-open session — including sessions that SPAN micro-batch
  * seams — and cross-batch disorder must fail loudly. */
class StreamingSessionizeSpec extends SparkSpec {
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

  private val gapUs = 30L * 60 * 1000000L

  /** 3 users × 12 events in 4 sessions each (30-min gap): minutes
    * 0/5/10 | 45/50 | 120/125/130/135 | 200/205/210. */
  private def eventRows: Seq[(Long, java.sql.Timestamp, Long, String, Double)] = {
    val minutes = Seq(0, 5, 10, 45, 50, 120, 125, 130, 135, 200, 205, 210)
    val types = Seq("view", "click", "purchase")
    for {
      u <- 1L to 3L
      (m, i) <- minutes.zipWithIndex
    } yield (u, new java.sql.Timestamp(1700000000000L + m * 60000L),
      u * 1000 + i, types(i % 3), i * 1.5 + u)
  }

  private type Row8 = (Long, Long, Long, Long, Long, Long, Long, Long)

  test("ordered replay emits exactly the batch sessions minus each user's open one") {
    withRocksDB {
      val rows = eventRows
      val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
      val batch = graft.ops.Sessionize.sessions(df, gapUs).as[Row8].collect()
      val lastIdx = batch.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
      val expect = batch.filterNot(r => lastIdx(r._1) == r._2).toSet
      assert(expect.size === 9, "fixture sanity: 3 closed sessions per user")

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val out = StreamingSessionize.sessions(
        input.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"), gapUs)
      val q = out.writeStream.format("memory").queryName("sess_stream")
        .outputMode("append").start()
      try {
        // per-user time-ordered slices whose seams SPLIT sessions 2 and 3
        val ordered = rows.sortBy(r => (r._2.getTime, r._3))
        Seq(ordered.filter(_._3 % 1000 <= 3), ordered.filter(r => {
          val i = r._3 % 1000; i >= 4 && i <= 7
        }), ordered.filter(_._3 % 1000 >= 8)).foreach { slice =>
          input.addData(slice)
          q.processAllAvailable()
        }
        val got = spark.table("sess_stream").as[Row8].collect().toSet
        assert(got === expect,
          "closed sessions must reproduce the batch rows across batch seams")
      } finally q.stop()
    }
  }

  test("cross-batch disorder fails the query loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val out = StreamingSessionize.sessions(
        input.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"), gapUs)
      val q = out.writeStream.format("memory").queryName("sess_disorder")
        .outputMode("append").start()
      try {
        input.addData(Seq((1L, new java.sql.Timestamp(2000000L), 2L, "view", 1.0)))
        q.processAllAvailable()
        input.addData(Seq((1L, new java.sql.Timestamp(1000000L), 1L, "view", 1.0)))
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def causes(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: causes(t.getCause)
        assert(causes(ex).exists(_.isInstanceOf[IllegalStateException]),
          s"expected the order-enforcement IllegalStateException, got $ex")
      } finally q.stop()
    }
  }
}
