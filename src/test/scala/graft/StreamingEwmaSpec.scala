package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingEwma

/** Replay-agreement pins for the streaming EWMA twin: the stateful
  * fold must equal the batch `a_ewma` window bit-for-bit on an
  * ordered replay (including frames that overflow the 16-row bound
  * across micro-batches), and cross-batch disorder must fail loudly
  * rather than silently diverge. */
class StreamingEwmaSpec extends SparkSpec {
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

  /** 60 events over 3 users (20 each — past the 16-row frame bound),
    * strictly increasing ts. */
  private def eventRows: Seq[(Long, java.sql.Timestamp, Long, Double)] =
    (0 until 60).map { i =>
      ((i % 3 + 1).toLong,
        new java.sql.Timestamp(1700000000000L + i * 60000L),
        (1000 + i).toLong,
        math.sin(i.toDouble) * 37.0 + i * 0.13)
    }

  test("streaming ewma equals the batch window on an ordered multi-batch replay") {
    withRocksDB {
      val rows = eventRows
      val dir = java.nio.file.Files.createTempDirectory("ewma-fixture").toString
      rows.toDF("user_id", "ts", "event_id", "value")
        .withColumn("event_type", lit("e")).withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = SparkEntry.queries("a_ewma")(spark, dir)
        .as[(Long, Long, Double)].collect()
        .map(r => r._2 -> (r._1, r._3)).toMap

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val out = StreamingEwma.ewma(
        input.toDF().toDF("user_id", "ts", "event_id", "value"))
      val q = out.writeStream.format("memory").queryName("ewma_stream")
        .outputMode("append").start()
      try {
        // three ordered slices — the per-user frame spans batch seams
        rows.grouped(20).foreach { slice =>
          input.addData(slice)
          q.processAllAvailable()
        }
        val got = spark.table("ewma_stream")
          .as[(Long, Long, Double)].collect()
          .map(r => r._2 -> (r._1, r._3)).toMap
        assert(got.size === 60)
        assert(got === batch,
          "ordered replay must reproduce the batch bounded-frame EWMA exactly")
      } finally q.stop()
    }
  }

  test("cross-batch disorder fails the query loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val out = StreamingEwma.ewma(
        input.toDF().toDF("user_id", "ts", "event_id", "value"))
      val q = out.writeStream.format("memory").queryName("ewma_disorder")
        .outputMode("append").start()
      try {
        input.addData(Seq((1L, new java.sql.Timestamp(2000000L), 2L, 1.0)))
        q.processAllAvailable()
        input.addData(Seq((1L, new java.sql.Timestamp(1000000L), 1L, 1.0)))
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
