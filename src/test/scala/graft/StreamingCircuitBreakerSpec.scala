package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingCircuitBreaker
import graft.streaming.StreamingCircuitBreaker.{Call, Decision}

/** Hand-replay pins for the circuit breaker: trip on consecutive
  * failures, reject through the cooldown, half-open probe re-trips
  * then closes, and rejected attempts never touch the failure count.
  */
class StreamingCircuitBreakerSpec extends SparkSpec {
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

  private def replay(slices: Seq[Seq[Call]], thr: Int, cooldown: Long,
      name: String): Seq[Decision] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Call]
    val q = StreamingCircuitBreaker.breaker(input.toDS(), thr, cooldown)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      slices.foreach { s => input.addData(s); q.processAllAvailable() }
      spark.table(name).as[Decision].collect().toSeq
        .sortBy(d => (d.key, d.ts_us, d.call_id))
    } finally q.stop()
  }

  test("trips, cools down, re-trips on a failed probe, closes on a good one") {
    withRocksDB {
      val got = replay(Seq(
        // two failures trip at ts 20
        Seq(Call("a", 0L, 1L, ok = true), Call("a", 10L, 2L, ok = false),
          Call("a", 20L, 3L, ok = false)),
        // rejected inside cooldown (trip 20 + 100); probe at 130 FAILS
        Seq(Call("a", 60L, 4L, ok = true), Call("a", 130L, 5L, ok = false)),
        // rejected inside the NEW cooldown (130 + 100); probe at 240
        // succeeds; next call runs closed
        Seq(Call("a", 200L, 6L, ok = true), Call("a", 240L, 7L, ok = true),
          Call("a", 250L, 8L, ok = false))),
        thr = 2, cooldown = 100L, "cb_hand")
      val expect = Seq(
        Decision("a", 0L, 1L, "closed", admitted = true),
        Decision("a", 10L, 2L, "closed", admitted = true),
        Decision("a", 20L, 3L, "closed", admitted = true), // trips here
        Decision("a", 60L, 4L, "open", admitted = false),
        Decision("a", 130L, 5L, "half_open", admitted = true), // re-trips
        Decision("a", 200L, 6L, "open", admitted = false),
        Decision("a", 240L, 7L, "half_open", admitted = true), // closes
        Decision("a", 250L, 8L, "closed", admitted = true))
      assert(got === expect)
    }
  }

  test("rejected attempts do not advance the failure count") {
    withRocksDB {
      // trip, then a would-be-failing attempt is rejected during
      // cooldown; the successful probe must still close the breaker
      val got = replay(Seq(
        Seq(Call("a", 0L, 1L, ok = false), Call("a", 1L, 2L, ok = false),
          Call("a", 50L, 3L, ok = false), Call("a", 200L, 4L, ok = true),
          Call("a", 201L, 5L, ok = true))),
        thr = 2, cooldown = 100L, "cb_void")
      assert(got.map(d => (d.state, d.admitted)) === Seq(
        ("closed", true), ("closed", true), ("open", false),
        ("half_open", true), ("closed", true)))
    }
  }

  test("keys break independently") {
    withRocksDB {
      val got = replay(Seq(
        Seq(Call("a", 0L, 1L, ok = false), Call("b", 0L, 2L, ok = true),
          Call("a", 1L, 3L, ok = true), Call("b", 1L, 4L, ok = true))),
        thr = 1, cooldown = 100L, "cb_keys")
      assert(got.filter(_.key == "a").map(_.state) === Seq("closed", "open"))
      assert(got.filter(_.key == "b").map(_.state) === Seq("closed", "closed"))
      assert(got.filter(_.key == "a").map(_.admitted) === Seq(true, false))
    }
  }
}
