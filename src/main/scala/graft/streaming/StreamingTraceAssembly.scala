package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming trace assembly (SURVEY.md §7.5): spans of one trace arrive
  * over time; a trace is "complete" when no new span has been seen for
  * `gapMs` of EVENT time — then exactly one assembled-trace row is
  * emitted and the per-trace state is dropped.
  *
  * This is the streaming twin of
  * [[graft.ops.TraceAnalytics.assembleTraces]] and replaces what the
  * reference delegates to Zipkin's UI ("select a particular trace",
  * reference README.adoc:133-135), but with bounded state: watermark +
  * event-time timeout ⇒ state size is O(open traces), independent of
  * stream length — the property that makes this safe on an unbounded
  * 100 TB/day stream.
  */
object StreamingTraceAssembly {

  case class SpanEvent(trace_id: String, span_id: String, name: String, ts: Timestamp)

  case class TraceBuf(names: List[String], firstMs: Long, lastMs: Long)

  case class AssembledTrace(
      trace_id: String, n_spans: Long, span_names: String,
      start_ms: Long, end_ms: Long)

  /** @param watermarkDelay how late spans may arrive (event time)
    * @param gapMs          inactivity gap that closes a trace */
  def assemble(spans: Dataset[SpanEvent], watermarkDelay: String, gapMs: Long)
      : Dataset[AssembledTrace] = {
    implicit val bufEnc = Encoders.product[TraceBuf]
    implicit val outEnc = Encoders.product[AssembledTrace]
    implicit val strEnc = Encoders.STRING
    spans
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.trace_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (traceId: String, events: Iterator[SpanEvent], state: GroupState[TraceBuf]) =>
          step(traceId, events, state, gapMs))
  }

  /** The same assembly semantics on the transformWithState API (the
    * successor to flatMapGroupsWithState): typed ValueState plus
    * explicit per-key event-time TIMERS instead of a single timeout
    * slot. The stale timer left by each earlier batch is deleted when
    * a new span extends the trace, so exactly one timer per open trace
    * is live — state stays O(open traces), same as [[assemble]].
    * Requires the RocksDB state store provider. */
  def assembleTws(spans: Dataset[SpanEvent], watermarkDelay: String, gapMs: Long)
      : Dataset[AssembledTrace] = {
    implicit val outEnc = Encoders.product[AssembledTrace]
    implicit val strEnc = Encoders.STRING
    spans
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.trace_id)
      .transformWithState(new TraceAssemblyProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  private class TraceAssemblyProcessor(gapMs: Long)
      extends StatefulProcessor[String, SpanEvent, AssembledTrace] {
    @transient private var buf: ValueState[TraceBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[TraceBuf]("buf",
        Encoders.product[TraceBuf], TTLConfig.NONE)

    override def handleInputRows(traceId: String, rows: Iterator[SpanEvent],
        tv: TimerValues): Iterator[AssembledTrace] = {
      val had = buf.exists()
      val old = if (had) buf.get() else TraceBuf(Nil, Long.MaxValue, Long.MinValue)
      val merged = rows.foldLeft(old) { (b, e) =>
        val t = e.ts.getTime
        TraceBuf(e.name :: b.names, math.min(b.firstMs, t), math.max(b.lastMs, t))
      }
      buf.update(merged)
      // keep exactly one live timer per open trace
      if (had && old.lastMs + gapMs != merged.lastMs + gapMs)
        getHandle.deleteTimer(old.lastMs + gapMs)
      getHandle.registerTimer(merged.lastMs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(traceId: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[AssembledTrace] = {
      if (!buf.exists()) Iterator.empty
      else {
        val b = buf.get()
        if (info.getExpiryTimeInMs() < b.lastMs + gapMs) Iterator.empty // stale timer
        else {
          buf.clear()
          Iterator.single(AssembledTrace(
            traceId, b.names.size.toLong, b.names.sorted.mkString(","),
            b.firstMs, b.lastMs))
        }
      }
    }
  }

  private[streaming] def step(
      traceId: String, events: Iterator[SpanEvent],
      state: GroupState[TraceBuf], gapMs: Long): Iterator[AssembledTrace] = {
    if (state.hasTimedOut) {
      val buf = state.get
      state.remove()
      Iterator.single(AssembledTrace(
        traceId, buf.names.size.toLong, buf.names.sorted.mkString(","),
        buf.firstMs, buf.lastMs))
    } else {
      val incoming = events.toList
      val old = state.getOption.getOrElse(TraceBuf(Nil, Long.MaxValue, Long.MinValue))
      val merged = incoming.foldLeft(old) { (b, e) =>
        val t = e.ts.getTime
        TraceBuf(e.name :: b.names, math.min(b.firstMs, t), math.max(b.lastMs, t))
      }
      state.update(merged)
      // close the trace once the watermark passes last-span + gap
      state.setTimeoutTimestamp(merged.lastMs + gapMs)
      Iterator.empty
    }
  }
}
