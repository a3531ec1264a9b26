package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `a_cusum` registry query: per-series
  * CUSUM drift detection over closed daily rows — the live "has the
  * level shifted?" alarm.
  *
  * State per key is FOUR longs — the prefix sum P and its running
  * minimum (upward shift), and the mirrored Q / min Q (downward
  * shift) — plus the day cursor. Nothing grows with history: the
  * batch operator's closed form S⁺ₜ = Pₜ − min(0, min_{j≤t} Pⱼ) is
  * exactly what a constant-size state can maintain, which is why the
  * batch side was written as prefix windows rather than a fold.
  *
  * The target mean μ (and the derived κ = μ/`kDiv`, h = μ/`hDiv`,
  * truncating division like the batch `div`) arrives as a LITERAL
  * per-key map — the persisted calibration scalar of the
  * a_trend_incremental convention — because a live detector cannot
  * know the full-history mean it is testing against.
  *
  * Input rows are CLOSED daily aggregates (event_type, day, x_fx),
  * e.g. from an upstream watermark-closed window aggregation (the
  * Pipeline.dailyDistinct shape). Cross-batch day order is enforced
  * loudly (the StreamingPacker convention); an ordered replay
  * reproduces the batch rows bit-for-bit (spec-pinned). */
object StreamingCusum {

  case class DailyRow(etype: String, day: Long, xFx: Long)
  case class CusumRow(event_type: String, day: Long, x: Long,
      sp_fx: Long, sn_fx: Long, alarm_up: Boolean, alarm_down: Boolean)
  case class CusumState(p: Long, minP: Long, q: Long, minQ: Long, lastDay: Long)

  /** daily(event_type, day, x_fx) → one CUSUM row per closed day. */
  def cusum(daily: DataFrame, mu: Map[String, Long],
      kDiv: Long = 50L, hDiv: Long = 10L): DataFrame = {
    implicit val inEnc = Encoders.product[DailyRow]
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[CusumRow]
    daily.select(col("event_type").as("etype"), col("day"),
        col("x_fx").as("xFx"))
      .as[DailyRow]
      .groupByKey(_.etype)
      .transformWithState(new CusumProcessor(mu, kDiv, hDiv),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private[streaming] class CusumProcessor(mu: Map[String, Long],
      kDiv: Long, hDiv: Long)
      extends StatefulProcessor[String, DailyRow, CusumRow] {
    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DailyRow],
        tv: TimerValues): Iterator[CusumRow] = {
      val m = mu.getOrElse(key,
        throw new IllegalStateException(s"no calibrated mean for series $key"))
      val k = m / kDiv
      val h = m / hDiv
      val sorted = rows.toSeq.sortBy(_.day)
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get()
        else CusumState(0L, Long.MaxValue, 0L, Long.MaxValue, Long.MinValue)
      if (sorted.head.day <= s.lastDay)
        throw new IllegalStateException(
          s"series $key: day ${sorted.head.day} arrived after ${s.lastDay} " +
            "was already folded — closed daily rows must be delivered in " +
            "day order across micro-batches")
      val out = sorted.map { r =>
        val p = s.p + (r.xFx - m - k)
        val minP = math.min(s.minP, p)
        val q = s.q + (m - k - r.xFx)
        val minQ = math.min(s.minQ, q)
        s = CusumState(p, minP, q, minQ, r.day)
        val sp = p - math.min(minP, 0L)
        val sn = q - math.min(minQ, 0L)
        CusumRow(key, r.day, r.xFx, sp, sn, sp > h, sn > h)
      }
      st.update(s)
      out.iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[CusumRow] =
      Iterator.empty
  }
}
