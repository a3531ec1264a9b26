package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingWindowedPercentiles
import graft.streaming.StreamingWindowedPercentiles.{ValObs, WinPctl}

class StreamingWindowedPercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000040000L // epoch ms, MINUTE-aligned
  private def obs(et: String, v: Double, offMs: Long) =
    ValObs(et, v, new Timestamp(t0 + offMs))

  private val minuteUs = 60L * 1000000L
  private val qs = Seq(("p50", 0.5), ("p95", 0.95))

  // two event types, two 1-minute windows; duplicate values so the
  // histogram genuinely aggregates, counts chosen so p50/p95 need
  // interpolation (n=4 ⇒ pos 1.5 and 2.85)
  private val fixture = Seq(
    obs("A", 1.0, 0), obs("A", 2.0, 1000), obs("A", 2.0, 2000),
    obs("A", 10.0, 50000),
    obs("A", 100.0, 61000), obs("A", 300.0, 62000),
    obs("B", 5.0, 0), obs("B", 5.0, 30000), obs("B", 7.0, 59000))

  test("streamed exact windowed percentiles equal the batch machinery on a replay") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.ops.ExactPercentiles.of(
        fixture.toDF().select(
          struct(unix_micros(window(col("ts"), "1 minute").getField("start")).as("w_us"),
            col("event_type").as("et")).as("k"),
          col("value").as("x")),
        qs, "win-pctl-spec-cum")
      .select(col("k.et"), col("k.w_us"), col("qname"), round(col("v"), 6))
      .as[(String, Long, String, Double)].collect().toSet

    val input = MemoryStream[ValObs]
    val out = StreamingWindowedPercentiles.exactWindowed(
      input.toDS(), "10 seconds", minuteUs, qs)
    val q = out.writeStream.format("memory").queryName("win_pctl_stream")
      .outputMode("append").start()
    try {
      input.addData(fixture: _*)
      q.processAllAvailable()
      input.addData(obs("ZZ", 0.0, 3600000)) // advance the watermark
      q.processAllAvailable()
      input.addData(obs("ZZ2", 0.0, 7200000)) // fire the timers
      q.processAllAvailable()
      val streamed = spark.table("win_pctl_stream").as[WinPctl].collect()
        .filterNot(_.event_type.startsWith("ZZ"))
      val got = streamed.map(p =>
        (p.event_type, p.w_start_us, p.qname,
          math.rint(p.v * 1e6) / 1e6)).toSet
      assert(got === batch)
      // every closed window emitted each quantile exactly once
      assert(streamed.length ===
        streamed.map(p => (p.event_type, p.w_start_us, p.qname)).distinct.length)
      // hand-checked: A window 0 has values 1,2,2,10 ⇒ p50 at pos 1.5
      // is 2.0; p95 at pos 2.85 lerps 2→10: 2 + 0.85·8 = 8.8
      val w0 = t0 * 1000L - (t0 * 1000L) % minuteUs
      assert(got.contains(("A", w0, "p50", 2.0)))
      assert(got.contains(("A", w0, "p95", 8.8)))
      // the n carried on each row is the window's row count
      assert(streamed.filter(p => p.event_type == "A" && p.w_start_us == w0)
        .forall(_.n === 4L))
    } finally q.stop()
  }

  test("the in-memory lerp matches Spark's percentile on a duplicated histogram") {
    val counts = Map(1.0 -> 3L, 5.0 -> 1L, 9.0 -> 2L)
    val got = StreamingWindowedPercentiles.emit(
      StreamingWindowedPercentiles.WinKey("x", 0L), counts,
      Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p100", 1.0)))
      .map(p => p.qname -> p.v).toMap
    val exp = Seq(1.0, 1.0, 1.0, 5.0, 9.0, 9.0).toDF("x")
      .agg(percentile(col("x"), array(lit(0.25), lit(0.5), lit(0.75), lit(1.0))))
      .head().getSeq[Double](0)
    assert(got("p25") === exp(0) && got("p50") === exp(1) &&
      got("p75") === exp(2) && got("p100") === exp(3))
  }
}
