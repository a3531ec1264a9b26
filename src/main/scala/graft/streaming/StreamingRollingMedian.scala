package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `a_rolling_median` registry query:
  * per-series trailing 15-day median over closed daily rows — the
  * robust live level estimate (the windowed complement of the
  * full-series a_anomaly_mad, which is inherently offline).
  *
  * State per key is the 15 NEWEST (day, value) pairs — exactly the
  * batch window frame, which is why the batch operator was written on
  * a bounded rowsBetween frame in the first place (the EWMA
  * convention: bound the BATCH operator so the twin can equal it).
  * Each closed day emits the doubled median (two middle order
  * statistics summed — exact longs); an ordered replay reproduces the
  * batch rows bit-for-bit (spec-pinned). Day order is enforced loudly
  * across micro-batches (the StreamingPacker convention). */
object StreamingRollingMedian {

  case class DailyObs(etype: String, day: Long, xFx: Long)
  case class MedianRow(event_type: String, day: Long, x: Long,
      n_window: Long, med2_roll: Long)
  case class FrameState(days: List[Long], vals: List[Long])

  /** daily(event_type, day, x) → one rolling-median row per closed
    * day. */
  def rollingMedian(daily: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[DailyObs]
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[MedianRow]
    daily.select(col("event_type").as("etype"), col("day"),
        col("x").as("xFx"))
      .as[DailyObs]
      .groupByKey(_.etype)
      .transformWithState(new MedianProcessor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private[streaming] class MedianProcessor
      extends StatefulProcessor[String, DailyObs, MedianRow] {
    @transient private var st: ValueState[FrameState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FrameState]("frame",
        Encoders.product[FrameState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DailyObs],
        tv: TimerValues): Iterator[MedianRow] = {
      val sorted = rows.toSeq.sortBy(_.day)
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else FrameState(Nil, Nil)
      if (s.days.nonEmpty && sorted.head.day <= s.days.last)
        throw new IllegalStateException(
          s"series $key: day ${sorted.head.day} arrived after ${s.days.last} " +
            "was already folded — closed daily rows must be delivered in " +
            "day order across micro-batches")
      val out = sorted.map { r =>
        val days = (s.days :+ r.day).takeRight(15)
        val vals = (s.vals :+ r.xFx).takeRight(15)
        s = FrameState(days, vals)
        val f = vals.sorted
        val n = f.length
        MedianRow(key, r.day, r.xFx, n.toLong,
          f((n + 1) / 2 - 1) + f((n + 2) / 2 - 1))
      }
      st.update(s)
      out.iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[MedianRow] =
      Iterator.empty
  }
}
