package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `a_sessionize` registry query
  * ([[graft.ops.Sessionize.sessions]]): per-user gap sessionization
  * that emits a session row the moment the gap that closes it is
  * observed — i.e. when the first event of the NEXT session arrives.
  * A user's final (still-open) session stays in state; on an ordered
  * replay the emitted rows are exactly the batch result minus each
  * user's last session, which is what the agreement spec pins.
  *
  * State per user is BOUNDED and tiny: the open session's running
  * aggregate (start/end micros, counts, the distinct event-type set —
  * bounded by the event-type vocabulary, not the event count) plus the
  * last (ts, event_id) folded. Cross-batch disorder fails loudly (the
  * [[StreamingPacker]] convention): a silently mis-sessionized stream
  * diverges from the batch window in a way no downstream check sees.
  */
object StreamingSessionize {

  case class SessEvent(userId: Long, tsUs: Long, eventId: Long,
    eventType: String, vFx: Long)
  case class SessRow(user_id: Long, sess_idx: Long, start_us: Long,
    end_us: Long, duration_us: Long, n_events: Long, n_types: Long,
    value_fx: Long)
  case class OpenSess(sessIdx: Long, startUs: Long, endUs: Long,
    nEvents: Long, types: Array[String], valueFx: Long)
  case class LastSeen(tsUs: Long, eventId: Long)

  /** events(user_id, ts: timestamp, event_id, event_type, value) →
    * closed session rows, keyed state only. */
  def sessions(events: DataFrame, gapUs: Long): DataFrame = {
    implicit val inEnc = Encoders.product[SessEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[SessRow]
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"),
        round(col("value") * 1000).cast("long").as("vFx"))
      .as[SessEvent]
      .groupByKey(_.userId)
      .transformWithState(new SessionProcessor(gapUs), TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  private class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessEvent, SessRow] {
    @transient private var open: ValueState[OpenSess] = _
    @transient private var last: ValueState[LastSeen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[OpenSess]("open", Encoders.product[OpenSess],
        TTLConfig.NONE)
      last = getHandle.getValueState[LastSeen]("last", Encoders.product[LastSeen],
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[SessEvent],
        tv: TimerValues): Iterator[SessRow] = {
      val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.eventId))
      if (sorted.isEmpty) return Iterator.empty
      if (last.exists()) {
        val l = last.get()
        val h = sorted.head
        if (h.tsUs < l.tsUs || (h.tsUs == l.tsUs && h.eventId <= l.eventId))
          throw new IllegalStateException(
            s"user $key: event ${h.eventId} (ts ${h.tsUs}) arrived after " +
              s"${l.eventId} (ts ${l.tsUs}) was already sessionized — replay " +
              "must deliver each user in (ts, event_id) order across " +
              "micro-batches, or sessions silently diverge from the batch window")
      }
      var cur: Option[OpenSess] = if (open.exists()) Some(open.get()) else None
      val out = Seq.newBuilder[SessRow]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.tsUs - s.endUs <= gapUs =>
            cur = Some(OpenSess(s.sessIdx, s.startUs, e.tsUs, s.nEvents + 1,
              if (s.types.contains(e.eventType)) s.types else s.types :+ e.eventType,
              s.valueFx + e.vFx))
          case _ =>
            cur.foreach(s => out += close(key, s))
            cur = Some(OpenSess(cur.map(_.sessIdx + 1).getOrElse(1L),
              e.tsUs, e.tsUs, 1L, Array(e.eventType), e.vFx))
        }
      }
      cur.foreach(open.update)
      val tail = sorted.last
      last.update(LastSeen(tail.tsUs, tail.eventId))
      out.result().iterator
    }

    private def close(userId: Long, s: OpenSess): SessRow =
      SessRow(userId, s.sessIdx, s.startUs, s.endUs, s.endUs - s.startUs,
        s.nEvents, s.types.distinct.length.toLong, s.valueFx)

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessRow] = Iterator.empty
  }
}
