package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.TraceAnalytics
import graft.streaming.StreamingCriticalPath
import graft.streaming.StreamingCriticalPath.{CriticalPath, SpanObs}

class StreamingCriticalPathSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def obs(trace: String, span: String, parent: String, dur: Long,
      offMs: Long, svc: String = "svc") =
    SpanObs(trace, span, parent, svc, dur, new Timestamp(t0 + offMs))

  // branching (root→{a,b}, a→leaf), a forest trace (two roots, one
  // dangling parent), and a chain deeper than maxDepth=3 (truncation)
  private val fixture = Seq(
    obs("T1", "r", null, 100L, 0),
    obs("T1", "a", "r", 50L, 10),
    obs("T1", "b", "r", 400L, 20),
    obs("T1", "al", "a", 500L, 30), // critical: 100+50+500 = 650 > 100+400
    obs("T2", "x", null, 10L, 0),
    obs("T2", "y", "ghost", 70L, 5), // dangling parent ⇒ local root
    obs("T2", "yl", "y", 20L, 9),    // 90 > 10 ⇒ critical 90
    obs("T3", "c1", null, 1L, 0),
    obs("T3", "c2", "c1", 2L, 1),
    obs("T3", "c3", "c2", 4L, 2),
    obs("T3", "c4", "c3", 8L, 3))    // depth 4 > maxDepth 3: c4 truncated

  test("streamed critical paths equal the batch operator on a replayed fixture") {
    implicit val sqlCtx = spark.sqlContext
    val batch = TraceAnalytics.criticalPath(
      fixture.toDF().select($"trace_id", $"span_id", $"parent_id", $"duration_us"),
      maxDepth = 3)
      .as[(String, Long, Long)].collect().toSet

    val input = MemoryStream[SpanObs]
    val out = StreamingCriticalPath.criticalPaths(
      input.toDS(), "10 seconds", gapMs = 5000L, maxDepth = 3)
    val q = out.writeStream.format("memory").queryName("crit_stream")
      .outputMode("append").start()
    try {
      input.addData(fixture: _*)
      q.processAllAvailable()
      input.addData(obs("ZZ", "z", null, 1L, 3600000)) // advance watermark
      q.processAllAvailable()
      input.addData(obs("ZZ2", "z", null, 1L, 7200000)) // run the timeouts
      q.processAllAvailable()
      val streamed = spark.table("crit_stream").as[CriticalPath].collect()
        .filterNot(_.trace_id.startsWith("ZZ")) // watermark sentinels
        .map(c => (c.trace_id, c.n_spans, c.critical_path_us)).toSet
      assert(streamed === batch)
      // the fixture's hand-checkable headline numbers
      assert(streamed.contains(("T1", 4L, 650L)))
      assert(streamed.contains(("T2", 3L, 90L)))
      assert(streamed.contains(("T3", 4L, 7L))) // 1+2+4, c4 beyond depth 3
    } finally q.stop()
  }

  test("streaming slow-trace gate agrees with batch traceAnomalies on a replay") {
    implicit val sqlCtx = spark.sqlContext
    // one topology class (root+child, n_spans=2): five ~20us traces
    // and one 510us outlier; z=1 flags exactly the outlier
    val traces = (1 to 5).map(i =>
      Seq(obs(s"S$i", "r", null, 10L, i * 10),
        obs(s"S$i", "c", "r", 10L, i * 10 + 1))).flatten ++
      Seq(obs("S6", "r", null, 10L, 100), obs("S6", "c", "r", 500L, 101))
    val cpBatch = TraceAnalytics.criticalPath(
      traces.toDF().select($"trace_id", $"span_id", $"parent_id", $"duration_us"),
      maxDepth = 3)
    val baseline = TraceAnalytics.anomalyBaseline(cpBatch, 1.0)
    val batchFlags = TraceAnalytics.traceAnomalies(cpBatch, 1.0)
      .as[(String, Long, Long)].collect().toSet

    val input = MemoryStream[SpanObs]
    val cps = StreamingCriticalPath.criticalPaths(
      input.toDS(), "10 seconds", gapMs = 5000L, maxDepth = 3)
    val out = StreamingCriticalPath.slowTraces(cps, baseline)
    val q = out.writeStream.format("memory").queryName("crit_slow")
      .outputMode("append").start()
    try {
      input.addData(traces: _*)
      q.processAllAvailable()
      input.addData(obs("ZZ", "z", null, 1L, 3600000))
      q.processAllAvailable()
      input.addData(obs("ZZ2", "z", null, 1L, 7200000))
      q.processAllAvailable()
      val streamed = spark.table("crit_slow").as[CriticalPath].collect()
        .filterNot(_.trace_id.startsWith("ZZ"))
        .map(c => (c.trace_id, c.n_spans, c.critical_path_us)).toSet
      assert(streamed === batchFlags)
      assert(streamed === Set(("S6", 2L, 510L))) // exactly the outlier
    } finally q.stop()
  }

  test("windowed service latency matches the same aggregate run in batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // two services across two 1-minute windows; accuracy >> distinct
    // values, so the sketch is exact and batch equality is strict
    val spans = Seq(
      obs("T", "a", null, 100L, 0, "gw"), obs("T", "b", null, 200L, 1000, "gw"),
      obs("T", "c", null, 300L, 2000, "gw"), obs("T2", "d", null, 50L, 500, "app"),
      obs("T3", "e", null, 80L, 61000, "gw"), obs("T3", "f", null, 40L, 62000, "app"))
    val expected = spans.toDF()
      .groupBy(window(col("ts"), "1 minute").as("w"), col("service"))
      .agg(count(lit(1)).as("n_spans"), max(col("duration_us")).as("max_us"),
        percentile_approx(col("duration_us").cast("double"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("ps"))
      .select(col("w.start").as("window_start"), col("service"),
        col("n_spans"), col("max_us"),
        col("ps")(0).as("p50_us"), col("ps")(1).as("p95_us"))
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[SpanObs]
    val out = StreamingCriticalPath.serviceLatency(input.toDS(), "10 seconds", "1 minute")
    val q = out.writeStream.format("memory").queryName("svc_lat")
      .outputMode("append").start()
    try {
      input.addData(spans: _*)
      q.processAllAvailable()
      input.addData(obs("ZZ", "z", null, 1L, 7200000)) // close all windows
      q.processAllAvailable()
      // the sentinel (service "svc") closes the fixture windows; its
      // own window row may not be final yet — compare fixture services
      val got = spark.table("svc_lat").collect().map(_.toSeq)
        .filterNot(_(1) == "svc").toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("closed-trace edges match the batch edgeDurations multiset on a replayed corpus") {
    implicit val sqlCtx = spark.sqlContext
    // the shared fixture has services defaulted; re-tag a few so edge
    // labels are non-trivial, keep the dangling parent (emits nothing)
    val spans = Seq(
      obs("T1", "r", null, 100L, 0, "gw"),
      obs("T1", "a", "r", 50L, 10, "app"),
      obs("T1", "b", "r", 400L, 20, "app"),
      obs("T1", "al", "a", 500L, 30, "db"),
      obs("T2", "x", null, 10L, 0, "gw"),
      obs("T2", "y", "ghost", 70L, 5, "app"), // dangling parent: no edge
      obs("T2", "yl", "y", 20L, 9, "db"))
    val expected = TraceAnalytics.edgeDurations(spans.toDF()
        .select("trace_id", "span_id", "parent_id", "service", "duration_us"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted

    val input = MemoryStream[SpanObs]
    val out = StreamingCriticalPath.closedTraceEdges(input.toDS(), "5 seconds", 1000L)
    val q = out.writeStream.format("memory").queryName("trace_edges")
      .outputMode("append").start()
    try {
      input.addData(spans: _*)
      q.processAllAvailable()
      input.addData(obs("ZZ", "z", null, 1L, 600000)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("trace_edges").as[StreamingCriticalPath.EdgeObs]
        .collect().map(e => (e.edge, e.duration_us.toDouble)).sorted
      assert(got === expected)
    } finally q.stop()
  }

  test("an open trace stays buffered; spans across batches merge before the fold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SpanObs]
    val out = StreamingCriticalPath.criticalPaths(
      input.toDS(), "10 seconds", gapMs = 5000L, maxDepth = 3)
    val q = out.writeStream.format("memory").queryName("crit_open")
      .outputMode("append").start()
    try {
      input.addData(obs("T", "r", null, 100L, 0))
      q.processAllAvailable()
      input.addData(obs("T", "k", "r", 30L, 1000)) // second batch, same trace
      q.processAllAvailable()
      assert(spark.table("crit_open").count() === 0) // still open
      input.addData(obs("W", "w", null, 1L, 3600000))
      q.processAllAvailable()
      input.addData(obs("W2", "w", null, 1L, 7200000))
      q.processAllAvailable()
      val t = spark.table("crit_open").as[CriticalPath].collect()
        .find(_.trace_id == "T").get
      assert(t.n_spans === 2L && t.critical_path_us === 130L)
    } finally q.stop()
  }
}
