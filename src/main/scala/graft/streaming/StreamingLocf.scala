package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the LOCF leg of the batch `a_gap_fill` registry
  * query: as closed daily rows arrive per series, any skipped
  * calendar days are emitted immediately with the carried-forward
  * value — the live gap-filler in front of a dashboard.
  *
  * Only LOCF streams: linear interpolation needs the NEXT observation
  * and is inherently offline (the batch operator carries both; this
  * twin is the subset a stream can causally produce). State per key
  * is ONE (day, value) pair; a skipped-day burst emits its fill rows
  * in the batch that closes the gap, so replaying the observed days
  * in order reproduces the batch locf_fx column row-for-row from the
  * first observation onward (spec-pinned — the batch's pre-first-
  * observation spine rows carry null LOCF and no stream can know the
  * spine start, so they are exactly the rows a replay does not
  * produce). Cross-batch day order is enforced loudly (the
  * StreamingPacker convention). */
object StreamingLocf {

  case class DailyObs(etype: String, day: Long, vFx: Long)
  case class LocfRow(event_type: String, day: Long, locf_fx: Long,
      is_gap: Boolean)
  case class LocfState(lastDay: Long, lastVal: Long)

  /** obs(event_type, day, v_fx) → one row per calendar day from each
    * series' first observation to its latest. */
  def locf(obs: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[DailyObs]
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[LocfRow]
    obs.select(col("event_type").as("etype"), col("day"),
        col("v_fx").as("vFx"))
      .as[DailyObs]
      .groupByKey(_.etype)
      .transformWithState(new LocfProcessor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  private[streaming] class LocfProcessor
      extends StatefulProcessor[String, DailyObs, LocfRow] {
    @transient private var st: ValueState[LocfState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[LocfState]("locf",
        Encoders.product[LocfState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DailyObs],
        tv: TimerValues): Iterator[LocfRow] = {
      val sorted = rows.toSeq.sortBy(_.day)
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else null
      if (s != null && sorted.head.day <= s.lastDay)
        throw new IllegalStateException(
          s"series $key: day ${sorted.head.day} arrived after ${s.lastDay} " +
            "was already filled — closed daily rows must be delivered in " +
            "day order across micro-batches")
      val out = Seq.newBuilder[LocfRow]
      sorted.foreach { r =>
        if (s != null)
          ((s.lastDay + 1) until r.day).foreach { d =>
            out += LocfRow(key, d, s.lastVal, is_gap = true)
          }
        out += LocfRow(key, r.day, r.vFx, is_gap = false)
        s = LocfState(r.day, r.vFx)
      }
      st.update(s)
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[LocfRow] =
      Iterator.empty
  }
}
