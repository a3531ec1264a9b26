package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** Streaming twin of the batch `a_attribution_bounded` registry query:
  * per purchase, first/last-touch and touch count over the 8 most
  * recent preceding views inside the 6h window — emitted the moment
  * the purchase arrives, from per-user state that is BOUNDED AND TINY
  * by construction: exactly the 8 newest view timestamps plus the
  * (ts, event_id) ordering cursor. The bound is the whole point (and
  * why the unbounded `a_attribution` has no streaming twin): the
  * unbounded form must hoard every view for 6h, which at production
  * event rates is per-user state proportional to traffic, not a
  * declared constant.
  *
  * Batch equivalence: "the 8 newest views overall, filtered to the
  * window at purchase time" equals the batch's "8 newest in-window
  * views" because in-window views are by definition newer than
  * out-of-window ones — so keeping the newest 8 regardless of age and
  * filtering on read is the same multiset. Views at exactly the
  * purchase timestamp never count (the batch join is strict
  * `v_us < p_us`); same-timestamp events within a micro-batch are
  * folded purchases-first to mirror that. The one seam the state
  * bound cannot see: a view tied to the microsecond with a LATER
  * purchase of the same user, arriving in an earlier micro-batch,
  * can evict an older in-window view that the batch rank would have
  * counted — with microsecond timestamps this requires an exact
  * same-user view/purchase tie across a batch seam; the ordering
  * enforcement already rejects everything coarser.
  *
  * Cross-batch order is ENFORCED loudly (the [[StreamingEwma]] /
  * StreamingPacker convention): an event at or before the cursor
  * fails the query, because a silently mis-ordered fold diverges
  * from the batch join in a way no downstream check can see. */
object StreamingAttribution {

  case class AttrEvent(userId: Long, tsUs: Long, eventId: Long, eventType: String)
  case class Attribution(p_id: Long, user_id: Long, p_us: Long,
    first_touch_us: Option[Long], last_touch_us: Option[Long],
    n_touch_views: Long)
  case class Views(tsUs: Array[Long])
  case class Cursor(tsUs: Long, eventId: Long)

  /** events(event_id, ts: timestamp, user_id, event_type) → one
    * attribution row per purchase, keyed state only. */
  def attribution(events: DataFrame, maxViews: Int = 8,
      windowUs: Long = 21600000000L): DataFrame = {
    implicit val inEnc = Encoders.product[AttrEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Attribution]
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eventId"),
        col("event_type").as("eventType"))
      .as[AttrEvent]
      .groupByKey(_.userId)
      .transformWithState(new AttrProcessor(maxViews, windowUs),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private class AttrProcessor(maxViews: Int, windowUs: Long)
      extends StatefulProcessor[Long, AttrEvent, Attribution] {
    @transient private var views: ValueState[Views] = _
    @transient private var cursor: ValueState[Cursor] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      views = getHandle.getValueState[Views]("views", Encoders.product[Views],
        TTLConfig.NONE)
      cursor = getHandle.getValueState[Cursor]("cursor",
        Encoders.product[Cursor], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[AttrEvent],
        tv: TimerValues): Iterator[Attribution] = {
      // purchases before views on timestamp ties: a same-instant view
      // never attributes to the purchase (strict v_us < p_us in batch)
      val sorted = rows.toSeq.sortBy(e =>
        (e.tsUs, if (e.eventType == "purchase") 0 else 1, e.eventId))
      if (sorted.isEmpty) return Iterator.empty
      if (cursor.exists()) {
        val c = cursor.get()
        val h = sorted.head
        if (h.tsUs < c.tsUs || (h.tsUs == c.tsUs && h.eventId <= c.eventId))
          throw new IllegalStateException(
            s"user $key: event ${h.eventId} (ts ${h.tsUs}) arrived after " +
              s"${c.eventId} (ts ${c.tsUs}) was already folded — replay must " +
              "deliver each user in (ts, event_id) order across micro-batches, " +
              "or attribution silently diverges from the batch join")
      }
      var vs: Array[Long] = if (views.exists()) views.get().tsUs else Array.empty
      val out = sorted.flatMap { e =>
        e.eventType match {
          case "purchase" =>
            val touched = vs.filter(t => t < e.tsUs && t >= e.tsUs - windowUs)
            Some(Attribution(e.eventId, key, e.tsUs,
              if (touched.isEmpty) None else Some(touched.min),
              if (touched.isEmpty) None else Some(touched.max),
              touched.length.toLong))
          case "view" =>
            // ascending by construction (ordered fold): append + trim
            vs = (vs :+ e.tsUs).takeRight(maxViews)
            None
          case _ => None
        }
      }
      views.update(Views(vs))
      val tail = sorted.maxBy(e => (e.tsUs, e.eventId))
      cursor.update(Cursor(tail.tsUs, tail.eventId))
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Attribution] = Iterator.empty
  }
}
