package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** EXACT per-window percentiles on a stream — the live twin of the
  * batch `a_windowed_percentiles` registry row, which runs the shared
  * [[graft.ops.ExactPercentiles]] order-statistic machinery per
  * (event_type, tumbling window) group.
  *
  * [[StreamingCriticalPath.serviceLatency]] is the sketch-based
  * monitor (percentile_approx merges like any aggregate and is the
  * only percentile an unbounded per-key stream can afford); this
  * operator is the exact one, and it is affordable for the same
  * reason the batch side is: state per open window is the VALUE
  * HISTOGRAM (distinct value → count), not the row buffer, and a
  * window's histogram is complete once the watermark passes its end.
  * At that moment — an event-time timer per open window — the exact
  * interpolated percentiles are computed in memory over the
  * histogram with literally the batch lerp
  * (`lo + (pos − lo)·(hi − lo)` over the two bracketing order
  * statistics), one row per quantile is emitted, and the state is
  * dropped. Append output: a window's percentiles are emitted
  * exactly once, and are final.
  *
  * Equality with the batch operator on a replayed stream is
  * spec-pinned (StreamingWindowedPercentilesSpec): same windows,
  * same quantile values bit-for-bit after the shared rounding. */
object StreamingWindowedPercentiles {

  /** One observation; `ts` is event time. */
  case class ValObs(event_type: String, value: Double, ts: Timestamp)

  /** Group key: (event_type, epoch-aligned window start in micros). */
  case class WinKey(event_type: String, w_us: Long)

  /** Per-window state: value histogram. */
  case class Hist(counts: Map[Double, Long])

  /** One output row per (window, event_type, quantile). */
  case class WinPctl(event_type: String, w_start_us: Long, qname: String,
      v: Double, n: Long)

  private def epochUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** @param watermarkDelay how late values may arrive (event time)
    * @param windowUs       tumbling window length in microseconds
    * @param qs             (name, quantile) pairs, quantile in [0,1] */
  def exactWindowed(vals: Dataset[ValObs], watermarkDelay: String,
      windowUs: Long, qs: Seq[(String, Double)]): Dataset[WinPctl] = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    implicit val bufEnc = Encoders.product[Hist]
    implicit val keyEnc = Encoders.product[WinKey]
    implicit val outEnc = Encoders.product[WinPctl]
    vals
      .withWatermark("ts", watermarkDelay)
      .groupByKey(o =>
        WinKey(o.event_type, Math.floorDiv(epochUs(o.ts), windowUs) * windowUs))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: WinKey, events: Iterator[ValObs], state: GroupState[Hist]) =>
          step(key, events, state, windowUs, qs))
  }

  private def step(key: WinKey, events: Iterator[ValObs],
      state: GroupState[Hist], windowUs: Long,
      qs: Seq[(String, Double)]): Iterator[WinPctl] = {
    if (state.hasTimedOut) {
      val hist = state.get.counts
      state.remove()
      emit(key, hist, qs)
    } else {
      val merged = events.foldLeft(
        state.getOption.map(_.counts).getOrElse(Map.empty[Double, Long])) {
        (m, e) => m.updated(e.value, m.getOrElse(e.value, 0L) + 1L)
      }
      state.update(Hist(merged))
      // the window is complete when the watermark passes its end; a
      // straggler arriving after that point re-opens nothing (its
      // window already emitted) — it lands in fresh state that times
      // out immediately, so the timer is clamped to stay legal
      val winEndMs = Math.floorDiv(key.w_us + windowUs, 1000L)
      state.setTimeoutTimestamp(
        math.max(winEndMs, state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }
  }

  /** The batch lerp over the in-memory histogram: pos = q·(n−1),
    * bracketing order statistics at floor/ceil(pos), linear
    * interpolation — value-identical to
    * [[graft.ops.ExactPercentiles.of]] per group. */
  private[graft] def emit(key: WinKey, counts: Map[Double, Long],
      qs: Seq[(String, Double)]): Iterator[WinPctl] = {
    if (counts.isEmpty) return Iterator.empty
    val vals = counts.toArray.sortBy(_._1)
    val n = vals.iterator.map(_._2).sum
    def at(rank: Long): Double = {
      var cum = 0L; var i = 0
      while (i < vals.length) {
        cum += vals(i)._2
        if (rank < cum) return vals(i)._1
        i += 1
      }
      vals(vals.length - 1)._1
    }
    qs.iterator.map { case (qname, q) =>
      val pos = q * (n - 1).toDouble
      val lo = math.floor(pos).toLong
      val vLo = at(lo); val vHi = at(math.ceil(pos).toLong)
      WinPctl(key.event_type, key.w_us, qname,
        vLo + (pos - lo.toDouble) * (vHi - vLo), n)
    }
  }
}
