package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `a_trend` registry query: per-group
  * OLS trend (slope/intercept of event value over day offsets) kept
  * incrementally — the live "is error cost rising?" monitor.
  *
  * State per key is the textbook mergeable regression state: SIX
  * longs (day0 and the exact integer moments n, Σx, Σy, Σxy, Σx²)
  * plus the order cursor. Nothing grows with history — this is why
  * the batch operator was designed on integer moments in the first
  * place: the same six numbers are a partial-agg buffer in batch and
  * a keyed state in streaming.
  *
  * Batch equivalence: the batch x-offsets are day − min(day) per
  * group; with the enforced (ts, event_id) in-order delivery (the
  * [[StreamingPacker]] convention) the FIRST event's day IS that
  * minimum, so the streaming moments equal the batch moments after
  * any prefix, and the emitted slope/intercept — computed with the
  * batch operator's exact double operation order — agree bit-for-bit
  * at the shared round-4 emission. One row per key per micro-batch
  * (the trend "as of" that batch); a replay's final row equals the
  * batch query (spec-pinned). */
object StreamingTrend {

  case class TrendEvent(etype: String, tsUs: Long, eventId: Long, yFx: Long)
  case class TrendRow(event_type: String, n: Long, slope_per_day: Double,
      intercept: Double)
  case class TrendState(day0: Long, n: Long, sx: Long, sy: Long, sxy: Long,
      sxx: Long, lastTsUs: Long, lastEventId: Long)

  /** events(event_type, ts: timestamp, event_id, value) → one updated
    * trend row per event_type per micro-batch. */
  def trend(events: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[TrendEvent]
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[TrendRow]
    events.select(
        col("event_type").as("etype"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eventId"),
        expr("CAST(round(value * 10000) AS BIGINT)").as("yFx"))
      .as[TrendEvent]
      .groupByKey(_.etype)
      .transformWithState(new TrendProcessor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private[streaming] class TrendProcessor
      extends StatefulProcessor[String, TrendEvent, TrendRow] {
    @transient private var st: ValueState[TrendState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TrendState]("moments",
        Encoders.product[TrendState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TrendEvent],
        tv: TimerValues): Iterator[TrendRow] = {
      val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.eventId))
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get()
        else TrendState(sorted.head.tsUs / 86400000000L, 0L, 0L, 0L, 0L, 0L,
          Long.MinValue, Long.MinValue)
      val h = sorted.head
      if (h.tsUs < s.lastTsUs ||
          (h.tsUs == s.lastTsUs && h.eventId <= s.lastEventId))
        throw new IllegalStateException(
          s"event_type $key: event ${h.eventId} (ts ${h.tsUs}) arrived after " +
            s"${s.lastEventId} (ts ${s.lastTsUs}) was already folded — the " +
            "first-day-is-min-day premise needs (ts, event_id) in-order " +
            "delivery across micro-batches")
      sorted.foreach { e =>
        val x = e.tsUs / 86400000000L - s.day0
        s = s.copy(n = s.n + 1, sx = s.sx + x, sy = s.sy + e.yFx,
          sxy = s.sxy + x * e.yFx, sxx = s.sxx + x * x,
          lastTsUs = e.tsUs, lastEventId = e.eventId)
      }
      st.update(s)
      // the batch projection's exact operation order
      val num = s.n.toDouble * s.sxy - s.sx.toDouble * s.sy
      val den = s.n.toDouble * s.sxx - s.sx.toDouble * s.sx
      if (den == 0.0)
        Iterator.single(TrendRow(key, s.n, Double.NaN, Double.NaN))
      else {
        def r4(x: Double) = BigDecimal(x)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Iterator.single(TrendRow(key, s.n,
          r4(num / den / 10000.0),
          r4((s.sy.toDouble - num / den * s.sx) / s.n / 10000.0)))
      }
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[TrendRow] =
      Iterator.empty
  }
}
