package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `a_funnel` query: per-user ordered
  * funnel view → click → purchase with strict inter-step event-time
  * ordering and a per-step conversion window, folded incrementally.
  *
  * Why the incremental fold is EXACT here and not an approximation:
  * with events delivered in (ts, event_id) order per user — enforced
  * below, the [[StreamingEwma]]/[[StreamingPacker]] convention — the
  * first view IS min(view ts), and the first qualifying click after
  * it IS the batch min over the window, because nothing earlier can
  * arrive later. State per user is three timestamps plus the order
  * cursor; output is one row per DEPTH TRANSITION (user, new depth,
  * at ts), so the stream emits funnel progress as it happens and the
  * final depth per user equals the batch funnel's (spec-pinned). The
  * batch histogram is one tiny aggregation over the final depths. */
object StreamingFunnel {

  case class FunnelEvent(userId: Long, tsUs: Long, eventId: Long, eventType: String)
  case class FunnelStep(user_id: Long, depth: Int, at_us: Long)
  case class FState(t1: Long, t2: Long, t3: Long,
      lastTs: Long, lastId: Long)

  /** events(user_id, ts, event_id, event_type) → depth transitions.
    * `windowUs`: per-step conversion window in microseconds (the
    * batch query's 6 hours = 21_600_000_000L). */
  def funnel(events: DataFrame, windowUs: Long): DataFrame = {
    implicit val inEnc = Encoders.product[FunnelEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[FunnelStep]
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"))
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(windowUs),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private class FunnelProcessor(windowUs: Long)
      extends StatefulProcessor[Long, FunnelEvent, FunnelStep] {
    @transient private var st: ValueState[FState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FState]("fstate", Encoders.product[FState],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[FunnelStep] = {
      val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.eventId))
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else FState(-1L, -1L, -1L, Long.MinValue, Long.MinValue)
      sorted.headOption.foreach { h =>
        if (h.tsUs < s.lastTs || (h.tsUs == s.lastTs && h.eventId <= s.lastId))
          throw new IllegalStateException(
            s"user $key: event ${h.eventId} (ts ${h.tsUs}) arrived after " +
              s"(${s.lastTs}, ${s.lastId}) was already folded — replay must " +
              "deliver each user in (ts, event_id) order, or the funnel's " +
              "first-qualifying-step fold diverges from the batch min")
      }
      val out = Seq.newBuilder[FunnelStep]
      sorted.foreach { e =>
        e.eventType match {
          case "view" if s.t1 < 0 =>
            s = s.copy(t1 = e.tsUs); out += FunnelStep(key, 1, e.tsUs)
          case "click" if s.t1 >= 0 && s.t2 < 0 &&
              e.tsUs > s.t1 && e.tsUs <= s.t1 + windowUs =>
            s = s.copy(t2 = e.tsUs); out += FunnelStep(key, 2, e.tsUs)
          case "purchase" if s.t2 >= 0 && s.t3 < 0 &&
              e.tsUs > s.t2 && e.tsUs <= s.t2 + windowUs =>
            s = s.copy(t3 = e.tsUs); out += FunnelStep(key, 3, e.tsUs)
          case _ => ()
        }
        s = s.copy(lastTs = e.tsUs, lastId = e.eventId)
      }
      st.update(s)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[FunnelStep] = Iterator.empty
  }
}
