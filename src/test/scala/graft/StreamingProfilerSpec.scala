package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.codec.Codecs
import graft.streaming.StreamingProfiler

/** Replay-agreement pins for the streaming profiler: after an
  * arbitrary multi-batch replay the emitted profile must equal a
  * batch computation of the SAME statistics — including the KMV
  * distinct estimator on the same portable hashes — and the sketch
  * state must stay capped at k. */
class StreamingProfilerSpec extends SparkSpec {
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

  /** 48 events, 40 distinct users (past the k=8 sketch bound), a few
    * null props rows. */
  private def eventRows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] =
    (0 until 48).map { i =>
      ((1000 + i).toLong,
        new java.sql.Timestamp(1700000000000L + i * 60000L),
        (i * 7 % 40).toLong,
        Seq("view", "click", "purchase")(i % 3),
        (i % 13) * 1.75 + 0.25,
        if (i % 8 == 0) null else s"""{"k": ${i % 11}}""")
    }

  /** Batch replica of the profiler's statistics over one column. */
  private def batchCol(df: org.apache.spark.sql.DataFrame, name: String,
      dcol: Option[org.apache.spark.sql.Column],
      scol: org.apache.spark.sql.Column, k: Int)
      : (Long, Long, Long, Option[Double], Option[Double]) = {
    val n = df.count()
    val nulls = df.filter(scol.isNull).count()
    val hashes = df.filter(scol.isNotNull)
      .select(Codecs.portableHash(scol).as("h")).distinct()
      .orderBy("h").limit(k).as[Long].collect()
    val est =
      if (hashes.length < k) hashes.length.toLong
      else BigDecimal((k - 1).toDouble * 7.2057594037927936e16 / hashes.last)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mm = dcol.map { d =>
      val r = df.filter(scol.isNotNull).agg(min(d), max(d))
        .as[(Double, Double)].head()
      (r4(r._1), r4(r._2))
    }
    (n, nulls, est, mm.map(_._1), mm.map(_._2))
  }

  test("profiler replay equals the batch statistics, sketch included") {
    withRocksDB {
      val rows = eventRows
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val expect = Map(
        "event_id" -> batchCol(df, "event_id",
          Some(col("event_id").cast("double")), col("event_id").cast("string"), 8),
        "user_id" -> batchCol(df, "user_id",
          Some(col("user_id").cast("double")), col("user_id").cast("string"), 8),
        "value" -> batchCol(df, "value",
          Some(col("value")), col("value").cast("string"), 8),
        "event_type" -> batchCol(df, "event_type", None, col("event_type"), 8),
        "props" -> batchCol(df, "props", None, col("props"), 8))

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
      val out = StreamingProfiler.profile(input.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"), 8)
      val q = out.writeStream.format("memory").queryName("prof_stream")
        .outputMode("append").start()
      try {
        rows.grouped(17).foreach { slice =>
          input.addData(slice); q.processAllAvailable()
        }
        val got = spark.table("prof_stream")
          .as[(String, Long, Long, Long, Option[Double], Option[Double])].collect()
          .groupBy(_._1).map { case (kk, rs) =>
            val last = rs.maxBy(_._2)
            kk -> ((last._2, last._3, last._4, last._5, last._6))
          }
        assert(got === expect,
          "replayed profile must equal the batch statistics on every column")
        // the user_id sketch saturated (40 distinct > k=8): the
        // estimate is an estimate, but a sane one
        val uEst = got("user_id")._3
        assert(uEst >= 8 && uEst <= 120, s"user_id KMV estimate $uEst")
        // null accounting: every 8th props row was null
        assert(got("props")._2 === 6L)
      } finally q.stop()
    }
  }

  test("timer-driven profiler emits on its declared cadence, not per micro-batch") {
    withRocksDB {
      // processAllAvailable is unusable here BY DESIGN: while any
      // processing-time timer is registered the engine keeps
      // scheduling batches to check expiry, so "all available data
      // processed" never latches (measured: a free-running busy loop
      // at the default trigger). The spec therefore drives the query
      // with a 1s trigger and observes it from outside via
      // recentProgress + the sink table — exactly how a production
      // monitor is consumed.
      // 30 s cadence: the fold-before-cadence poll below gets the first
      // 20 s — query START alone can take several seconds when the
      // suite shares the box with the three sibling test JVMs (the 15 s
      // dial measured inputRows=0 at its 10 s deadline under that
      // contention, r15). The contract under test is unchanged.
      val cadenceMs = 30000L
      val rows = eventRows
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
      val out = StreamingProfiler.profileEvery(input.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        8, emitEveryMs = cadenceMs)
      val q = out.writeStream.format("memory").queryName("prof_timed")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
        .start()
      def inputRowsSoFar: Long =
        q.recentProgress.map(_.numInputRows).sum
      def pollUntil(deadline: Long)(cond: => Boolean): Unit =
        while (!cond && System.currentTimeMillis() < deadline)
          Thread.sleep(300L)
      try {
        // all 48 rows over two additions, folded across several 1s
        // batches well inside the cadence: state grows, NOTHING is
        // emitted — this is the whole contract (the per-batch
        // profiler would have emitted 5 rows per batch)
        val t0 = System.currentTimeMillis()
        input.addData(rows.take(17))
        input.addData(rows.drop(17))
        pollUntil(t0 + cadenceMs - 10000L) { inputRowsSoFar >= 48L }
        assert(inputRowsSoFar >= 48L, "input must fold within the cadence")
        assert(spark.table("prof_timed").count() === 0,
          "within the cadence window the monitor must stay silent")

        // when the cadence elapses the engine runs a timer batch on
        // its own (no new data needed) and every live column emits
        // its profile-so-far — poll until it lands
        pollUntil(t0 + cadenceMs + 60000L) {
          spark.table("prof_timed").count() >= 5L
        }
        val emitted = spark.table("prof_timed")
          .as[(String, Long, Long, Long, Option[Double], Option[Double])].collect()
        assert(emitted.length === 5,
          s"one row per column per expiry, got ${emitted.toSeq}")
        assert(emitted.map(_._1).toSet ===
          Set("event_id", "user_id", "value", "event_type", "props"))
        assert(emitted.forall(_._2 === 48L),
          s"each profile must cover all 48 folded rows: ${emitted.toSeq}")

        // inside the NEW cadence window: silent again (the timer
        // re-armed a full cadence out), even as fresh data folds
        input.addData(Seq((9999L, new java.sql.Timestamp(1700009999000L),
          1L, "view", 1.0, "{}")))
        Thread.sleep(3000L)
        assert(spark.table("prof_timed").count() === 5,
          "re-armed timer must hold the next emission until its cadence")
      } finally q.stop()
    }
  }
}
