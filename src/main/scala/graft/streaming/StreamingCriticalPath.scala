package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming critical-path extraction: the per-trace latency headline
  * ([[graft.ops.TraceAnalytics.criticalPath]]) computed as traces
  * close on a live span stream — the streaming side of the per-trace
  * view the reference delegates to Zipkin's UI (reference
  * README.adoc:133-135).
  *
  * Shape: spans buffer per trace_id under a watermark + event-time
  * timeout (the [[StreamingTraceAssembly]] closing rule — a trace is
  * done when no span arrived for `gapMs` of event time); when the
  * trace closes, the root-to-leaf DP runs IN MEMORY over that one
  * trace's spans and exactly one row is emitted. The distributed
  * iterate-and-join shape of the batch operator exists because a batch
  * corpus holds billions of traces at once; here the unit of work is
  * ONE trace — an application-bounded handful of spans (the topology's
  * fan-out, never data-sized) — so the local fold is the correct
  * scale shape: state is O(open traces × spans-per-trace), and no
  * shuffle beyond the one groupByKey the buffering already needs.
  *
  * The fold replays the batch recurrence literally — `maxDepth − 1`
  * rounds of "path(row) = duration + max over children of path", then
  * max over roots (parent null OR absent from the trace's span set, so
  * dangling edges surface as local roots) — which makes the
  * batch-equality spec exact, truncation behavior included. */
object StreamingCriticalPath {

  /** One span observation; `parent_id` null for roots. */
  case class SpanObs(trace_id: String, span_id: String, parent_id: String,
      duration_us: Long, ts: Timestamp)

  case class CriticalPath(trace_id: String, n_spans: Long, critical_path_us: Long)

  /** Buffered span (named product — a List of bare tuples breaks the
    * state encoder's codegen, and a private class is invisible to it). */
  case class SpanRec(span_id: String, parent_id: String, duration_us: Long)

  case class Buf(spans: List[SpanRec], lastMs: Long)

  /** @param watermarkDelay how late spans may arrive (event time)
    * @param gapMs          inactivity gap that closes a trace
    * @param maxDepth       DP depth bound — the topology's height,
    *                       same constant the batch caller passes */
  def criticalPaths(spans: Dataset[SpanObs], watermarkDelay: String,
      gapMs: Long, maxDepth: Int): Dataset[CriticalPath] = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    implicit val bufEnc = Encoders.product[Buf]
    implicit val outEnc = Encoders.product[CriticalPath]
    implicit val strEnc = Encoders.STRING
    spans
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.trace_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (traceId: String, events: Iterator[SpanObs], state: GroupState[Buf]) =>
          step(traceId, events, state, gapMs, maxDepth))
  }

  private[streaming] def step(traceId: String, events: Iterator[SpanObs],
      state: GroupState[Buf], gapMs: Long, maxDepth: Int): Iterator[CriticalPath] = {
    if (state.hasTimedOut) {
      val buf = state.get
      state.remove()
      Iterator.single(fold(traceId, buf.spans, maxDepth))
    } else {
      val old = state.getOption.getOrElse(Buf(Nil, Long.MinValue))
      val merged = events.foldLeft(old) { (b, e) =>
        Buf(SpanRec(e.span_id, e.parent_id, e.duration_us) :: b.spans,
          math.max(b.lastMs, e.ts.getTime))
      }
      state.update(merged)
      state.setTimeoutTimestamp(merged.lastMs + gapMs)
      Iterator.empty
    }
  }

  /** The batch recurrence over one trace's rows (not deduped by
    * span_id — the batch operator is row-oriented too, so duplicate
    * ids fold identically in both). */
  private[streaming] def fold(traceId: String,
      rows: List[SpanRec], maxDepth: Int): CriticalPath = {
    var path: List[(SpanRec, Long)] = rows.map(r => (r, r.duration_us))
    for (_ <- 1 until maxDepth) {
      val childMax = path.iterator
        .filter(_._1.parent_id != null)
        .foldLeft(Map.empty[String, Long]) { case (m, (r, p)) =>
          m.updated(r.parent_id, math.max(m.getOrElse(r.parent_id, Long.MinValue), p))
        }
      path = path.map { case (r, _) =>
        (r, r.duration_us + childMax.getOrElse(r.span_id, 0L))
      }
    }
    val ids = rows.iterator.map(_.span_id).toSet
    val rootPaths = path.collect {
      case (r, p) if r.parent_id == null || !ids.contains(r.parent_id) => p
    }
    CriticalPath(traceId, rows.size.toLong, rootPaths.max)
  }

  /** Live slow-trace gate: closed-trace rows from [[criticalPaths]]
    * probed against a static per-topology-class baseline —
    * (n_spans, threshold_us) as produced by
    * [[graft.ops.TraceAnalytics.anomalyBaseline]] over a batch corpus
    * — emitting only anomalously slow traces. Stream–static broadcast
    * join (the baseline is topology-sized), so the gate adds no
    * state and no shuffle to the closing pipeline; semantics equal
    * the batch [[graft.ops.TraceAnalytics.traceAnomalies]] by
    * construction (same threshold frame, same strict comparison —
    * spec-pinned on a replayed stream). */
  def slowTraces(cps: Dataset[CriticalPath], baseline: DataFrame)
      : Dataset[CriticalPath] = {
    implicit val outEnc = Encoders.product[CriticalPath]
    cps.join(broadcast(baseline.select(col("n_spans"), col("threshold_us"))),
        Seq("n_spans"))
      .filter(col("critical_path_us") > col("threshold_us"))
      .select(col("trace_id"), col("n_spans"), col("critical_path_us"))
      .as[CriticalPath]
  }
}
