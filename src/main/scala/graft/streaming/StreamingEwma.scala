package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `a_ewma` registry query: per-user
  * exponentially-weighted moving average (α = 1/2) over the last 16
  * values, in the batch operator's EXACT integer arithmetic — frame
  * values weighted 2^(16-L+i), one double division, HALF_UP round to
  * 4 digits.
  *
  * State per user is BOUNDED and tiny: the ≤15 most recent fixed-
  * point values plus the last (ts, event_id) seen — the truncated
  * frame is the whole reason the batch operator bounds its window at
  * 16 rows (an unbounded EWMA carries one double of state but can
  * never equal a bounded-frame batch window on replay).
  *
  * Batch equivalence: within a micro-batch a user's events are folded
  * in (ts, event_id) order (sorted below); ACROSS micro-batches the
  * order precondition is ENFORCED like [[StreamingPacker]] — an event
  * older than the newest already folded fails the query loudly,
  * because a silently mis-ordered frame diverges from the batch
  * window in a way no downstream check can see. */
object StreamingEwma {

  case class EwmaEvent(userId: Long, tsUs: Long, eventId: Long, vFx: Long)
  case class EwmaPoint(user_id: Long, event_id: Long, ewma: Double)
  case class Hist(vals: Array[Long])
  case class Last(tsUs: Long, eventId: Long)

  /** events(user_id, ts: timestamp, event_id, value) → one EWMA point
    * per event, keyed state only. */
  def ewma(events: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[EwmaEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[EwmaPoint]
    events.select(
        col("user_id").as("userId"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eventId"),
        round(col("value") * 1000).cast("long").as("vFx"))
      .as[EwmaEvent]
      .groupByKey(_.userId)
      .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private class EwmaProcessor
      extends StatefulProcessor[Long, EwmaEvent, EwmaPoint] {
    @transient private var hist: ValueState[Hist] = _
    @transient private var last: ValueState[Last] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      hist = getHandle.getValueState[Hist]("hist", Encoders.product[Hist],
        TTLConfig.NONE)
      last = getHandle.getValueState[Last]("last", Encoders.product[Last],
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EwmaEvent],
        tv: TimerValues): Iterator[EwmaPoint] = {
      val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.eventId))
      if (sorted.isEmpty) return Iterator.empty
      if (last.exists()) {
        val l = last.get()
        val h = sorted.head
        if (h.tsUs < l.tsUs || (h.tsUs == l.tsUs && h.eventId <= l.eventId))
          throw new IllegalStateException(
            s"user $key: event ${h.eventId} (ts ${h.tsUs}) arrived after " +
              s"${l.eventId} (ts ${l.tsUs}) was already folded — replay must " +
              "deliver each user in (ts, event_id) order across micro-batches, " +
              "or the frame silently diverges from the batch window")
      }
      var h: Array[Long] = if (hist.exists()) hist.get().vals else Array.empty
      val out = sorted.map { e =>
        val window = (h :+ e.vFx).takeRight(16)
        val L = window.length
        var num = 0L
        var i = 0
        while (i < L) { num += window(i) * (1L << (16 - L + i)); i += 1 }
        val den = 65536L - (1L << (16 - L))
        // the batch round(x, 4): HALF_UP on the shortest decimal form
        val ew = BigDecimal(num.toDouble / den / 1000.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        h = window.takeRight(15)
        EwmaPoint(key, e.eventId, ew)
      }
      hist.update(Hist(h))
      val tail = sorted.last
      last.update(Last(tail.tsUs, tail.eventId))
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[EwmaPoint] = Iterator.empty
  }
}
