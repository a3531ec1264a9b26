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
      offMs: Long) =
    SpanObs(trace, span, parent, dur, new Timestamp(t0 + offMs))

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
