package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `a_transitions` registry query: the
  * per-user event-type successor stream. State per user is ONE
  * (type, ts, event_id) triple — the previous event — so the footprint
  * is users × a few bytes regardless of history; each arriving event
  * emits exactly the (from, to) transition row the batch lead-window
  * would have produced, and aggregating the emitted rows reproduces
  * the batch transition matrix on replay (spec-pinned).
  *
  * In-order delivery per user is ENFORCED loudly across micro-batches
  * (the [[StreamingPacker]] convention): a late event would silently
  * mint transitions the batch window never saw. */
object StreamingTransitions {

  case class TransEvent(userId: Long, tsUs: Long, eventId: Long, etype: String)
  case class Transition(user_id: Long, from_type: String, to_type: String,
      event_id: Long)
  case class LastEvent(etype: String, tsUs: Long, eventId: Long)

  /** events(event_id, ts, user_id, event_type) → one transition row
    * per event after each user's first. */
  def transitions(events: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[TransEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Transition]
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eventId"),
        col("event_type").as("etype"))
      .as[TransEvent]
      .groupByKey(_.userId)
      .transformWithState(new TransProcessor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private[streaming] class TransProcessor
      extends StatefulProcessor[Long, TransEvent, Transition] {
    @transient private var st: ValueState[LastEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[LastEvent]("last",
        Encoders.product[LastEvent], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TransEvent],
        tv: TimerValues): Iterator[Transition] = {
      val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.eventId))
      if (sorted.isEmpty) return Iterator.empty
      var last: Option[LastEvent] = if (st.exists()) Some(st.get()) else None
      last.foreach { l =>
        val h = sorted.head
        if (h.tsUs < l.tsUs || (h.tsUs == l.tsUs && h.eventId <= l.eventId))
          throw new IllegalStateException(
            s"user $key: event ${h.eventId} (ts ${h.tsUs}) arrived after " +
              s"${l.eventId} (ts ${l.tsUs}) — a late event would mint " +
              "transitions the batch lead window never saw; deliver each " +
              "user in (ts, event_id) order across micro-batches")
      }
      val out = Seq.newBuilder[Transition]
      sorted.foreach { e =>
        last.foreach(l => out += Transition(key, l.etype, e.etype, e.eventId))
        last = Some(LastEvent(e.etype, e.tsUs, e.eventId))
      }
      st.update(last.get)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Transition] =
      Iterator.empty
  }
}
