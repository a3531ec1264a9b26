package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDebounce
import graft.streaming.StreamingDebounce.{Ev, Verdict}

/** Hand-replay pins for the per-key debounce: the admission anchor
  * advances only on admissions (a steady sub-gap drizzle stays
  * suppressed), the gap check is exact microseconds across micro-batch
  * seams, keys are independent, and disorder refuses loudly. */
class StreamingDebounceSpec extends SparkSpec {
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

  private def replay(slices: Seq[Seq[Ev]], gapUs: Long,
      name: String): Seq[Verdict] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingDebounce.debounce(input.toDS(), gapUs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      slices.foreach { s => input.addData(s); q.processAllAvailable() }
      spark.table(name).as[Verdict].collect().toSeq
        .sortBy(v => (v.key, v.ts_us, v.event_id))
    } finally q.stop()
  }

  test("the anchor advances only on admissions — drizzle stays suppressed") {
    withRocksDB {
      // gap 10: admissions at 0, 11 and 22. The drizzle at 4/8 is
      // rejected; 18 is rejected even though it is 10 past the REJECT
      // at 8 — anchoring on arrivals would have admitted it, anchoring
      // on admissions measures 7 past the admission at 11
      val got = replay(Seq(
        Seq(Ev("a", 0L, 1L), Ev("a", 4L, 2L), Ev("a", 8L, 3L)),
        Seq(Ev("a", 11L, 4L), Ev("a", 12L, 5L), Ev("a", 18L, 6L)),
        Seq(Ev("a", 22L, 7L))),
        gapUs = 10L, "deb_hand")
      val expect = Seq(
        Verdict("a", 0L, 1L, admitted = true, -1L),
        Verdict("a", 4L, 2L, admitted = false, 4L),
        Verdict("a", 8L, 3L, admitted = false, 8L),
        Verdict("a", 11L, 4L, admitted = true, 11L),
        Verdict("a", 12L, 5L, admitted = false, 1L),
        Verdict("a", 18L, 6L, admitted = false, 7L),
        Verdict("a", 22L, 7L, admitted = true, 11L))
      assert(got === expect)
    }
  }

  test("keys debounce independently; ties admit the first event only") {
    withRocksDB {
      val got = replay(Seq(
        Seq(Ev("a", 5L, 1L), Ev("a", 5L, 2L), Ev("b", 5L, 3L))),
        gapUs = 10L, "deb_keys")
      assert(got.filter(_.key == "a").map(_.admitted) === Seq(true, false))
      assert(got.filter(_.key == "b").map(_.admitted) === Seq(true))
    }
  }

  test("a regressing clock refuses loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Ev]
      val q = StreamingDebounce.debounce(input.toDS(), 10L)
        .writeStream.format("memory").queryName("deb_late")
        .outputMode("append").start()
      try {
        input.addData(Seq(Ev("a", 1000L, 1L)))
        q.processAllAvailable()
        input.addData(Seq(Ev("a", 999L, 2L)))
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def messages(t: Throwable): List[String] =
          if (t == null) Nil
          else Option(t.getMessage).toList ::: messages(t.getCause)
        assert(messages(e).exists(_.contains("arrived after the")), s"got: $e")
      } finally q.stop()
    }
  }
}
