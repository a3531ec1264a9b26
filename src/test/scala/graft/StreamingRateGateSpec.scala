package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingRateGate
import graft.streaming.StreamingRateGate.{Req, Verdict}

/** Hand-replay pins for the token-bucket rate gate: exact micro-token
  * refill arithmetic across micro-batch seams, the idle-gap clamp,
  * and the disorder refusal. */
class StreamingRateGateSpec extends SparkSpec {
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

  private def replay(slices: Seq[Seq[Req]], capacity: Long, rate: Long,
      name: String): Seq[Verdict] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Req]
    val q = StreamingRateGate.gate(input.toDS(), capacity, rate)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      slices.foreach { s => input.addData(s); q.processAllAvailable() }
      spark.table(name).as[Verdict].collect().toSeq
        .sortBy(v => (v.key, v.ts_us, v.req_id))
    } finally q.stop()
  }

  test("bucket spends, starves, refills and clamps exactly") {
    withRocksDB {
      val got = replay(Seq(
        Seq(Req("a", 0L, 1L), Req("a", 0L, 2L), Req("a", 0L, 3L)),
        Seq(Req("a", 500000L, 4L), Req("a", 1200000L, 5L)),
        Seq(Req("a", 100000000L, 6L))),
        capacity = 2L, rate = 1L, "rate_hand")
      val expect = Seq(
        Verdict("a", 0L, 1L, admitted = true, 1000000L),
        Verdict("a", 0L, 2L, admitted = true, 0L),
        Verdict("a", 0L, 3L, admitted = false, 0L),
        Verdict("a", 500000L, 4L, admitted = false, 500000L),
        Verdict("a", 1200000L, 5L, admitted = true, 200000L),
        // 98.8 s idle clamps to the full-refill horizon: full bucket
        Verdict("a", 100000000L, 6L, admitted = true, 1000000L))
      assert(got === expect)
    }
  }

  test("keys gate independently") {
    withRocksDB {
      val got = replay(Seq(
        Seq(Req("a", 0L, 1L), Req("a", 0L, 2L), Req("b", 0L, 3L))),
        capacity = 1L, rate = 1L, "rate_keys")
      assert(got.filter(_.key == "a").map(_.admitted) === Seq(true, false))
      assert(got.filter(_.key == "b").map(_.admitted) === Seq(true))
    }
  }

  test("a regressing clock refuses loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Req]
      val q = StreamingRateGate.gate(input.toDS(), 2L, 1L)
        .writeStream.format("memory").queryName("rate_late")
        .outputMode("append").start()
      try {
        input.addData(Seq(Req("a", 1000000L, 1L)))
        q.processAllAvailable()
        input.addData(Seq(Req("a", 0L, 2L)))
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("arrived after the bucket clock")))
      } finally q.stop()
    }
  }
}
