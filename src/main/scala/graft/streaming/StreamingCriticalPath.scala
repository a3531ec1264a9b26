package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.{functions => F}
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
      service: String, duration_us: Long, ts: Timestamp)

  case class CriticalPath(trace_id: String, n_spans: Long, critical_path_us: Long)

  /** Buffered span (named product — a List of bare tuples breaks the
    * state encoder's codegen, and a private class is invisible to it). */
  case class SpanRec(span_id: String, parent_id: String, service: String,
      duration_us: Long)

  /** One dependency edge of a closed trace: `edge` =
    * `parent_service + '>' + child_service`, duration = the CHILD
    * span's time — the same row shape
    * [[graft.ops.TraceAnalytics.edgeDurations]] feeds to the
    * percentile machinery in batch. */
  case class EdgeObs(trace_id: String, edge: String, duration_us: Long)

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
          step(traceId, events, state, gapMs,
            (t, rows) => Iterator.single(fold(t, rows, maxDepth))))
  }

  /** Dependency-edge extraction as traces close — the live face of
    * [[graft.ops.TraceAnalytics.edgeDurations]]: per closed trace,
    * one [[EdgeObs]] row per span whose parent is present in that
    * trace (batch is an inner join on (trace, parent=span), so
    * dangling parents emit nothing — multiset equality with the batch
    * operator on a replayed corpus is spec-pinned, duplicate span ids
    * included). Shares the [[criticalPaths]] buffering rule — same
    * watermark + event-time-gap close, same O(open traces ×
    * spans-per-trace) state — and the per-trace pairing runs in
    * memory over one trace's application-bounded span set. Feed the
    * output to [[serviceLatency]]-style windowed sketches or sink it
    * for the batch percentile machinery. */
  def closedTraceEdges(spans: Dataset[SpanObs], watermarkDelay: String,
      gapMs: Long): Dataset[EdgeObs] = {
    implicit val bufEnc = Encoders.product[Buf]
    implicit val outEnc = Encoders.product[EdgeObs]
    implicit val strEnc = Encoders.STRING
    spans
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.trace_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (traceId: String, events: Iterator[SpanObs], state: GroupState[Buf]) =>
          step(traceId, events, state, gapMs, edgesOf))
  }

  /** Batch [[graft.ops.TraceAnalytics.edgeDurations]] semantics over
    * one closed trace: an edge per (child row, matching parent ROW)
    * pair — a duplicated parent span id yields one edge per
    * occurrence, exactly like the batch join. */
  private[streaming] def edgesOf(traceId: String,
      rows: List[SpanRec]): Iterator[EdgeObs] = {
    val byId = rows.groupBy(_.span_id)
    rows.iterator.filter(_.parent_id != null).flatMap { r =>
      byId.getOrElse(r.parent_id, Nil).map(p =>
        EdgeObs(traceId, p.service + ">" + r.service, r.duration_us))
    }
  }

  private[streaming] def step[T](traceId: String, events: Iterator[SpanObs],
      state: GroupState[Buf], gapMs: Long,
      onClose: (String, List[SpanRec]) => Iterator[T]): Iterator[T] = {
    if (state.hasTimedOut) {
      val buf = state.get
      state.remove()
      onClose(traceId, buf.spans)
    } else {
      val old = state.getOption.getOrElse(Buf(Nil, Long.MinValue))
      val merged = events.foldLeft(old) { (b, e) =>
        Buf(SpanRec(e.span_id, e.parent_id, e.service, e.duration_us) :: b.spans,
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

  /** Windowed per-service latency monitoring — the live face of the
    * batch `q_service_latency` percentiles: per (tumbling window,
    * service), span counts, max and approximate p50/p95 duration with
    * late data bounded by the watermark. Append-mode: a window's row
    * is final once the watermark passes its end — exactly the feed a
    * latency dashboard tails. `percentile_approx` (t-digest-family
    * sketch) is the streaming-legal percentile: the batch side's
    * exact-histogram machinery needs a corpus-wide cumulative window
    * no unbounded stream can close, while the sketch merges
    * per-partition partial state like any other aggregate; at
    * `accuracy` ≥ the window's distinct-value count it degenerates to
    * exact (the spec pins window-for-window equality with the same
    * aggregate run in batch). */
  def serviceLatency(spans: Dataset[SpanObs], watermarkDelay: String,
      windowLen: String, accuracy: Int = 10000): DataFrame =
    spans.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(F.window(col("ts"), windowLen).as("w"), col("service"))
      .agg(F.count(F.lit(1)).as("n_spans"),
        F.max(col("duration_us")).as("max_us"),
        F.percentile_approx(col("duration_us").cast("double"),
          F.array(F.lit(0.5), F.lit(0.95)), F.lit(accuracy)).as("ps"))
      .select(col("w.start").as("window_start"), col("service"),
        col("n_spans"), col("max_us"),
        col("ps")(0).as("p50_us"), col("ps")(1).as("p95_us"))

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
