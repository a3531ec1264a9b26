package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the gaps-and-islands decomposition under the
  * batch `a_streaks` registry query: as each user's distinct active
  * days arrive in order, a streak CLOSES (and emits) the moment a
  * non-adjacent day proves the gap — the engagement tracker that
  * feeds "your N-day streak ended" messaging without ever rescanning
  * history.
  *
  * State per user is ONE (start, last) day pair. Only closed streaks
  * emit; the open tail streak lives in state (a causal stream cannot
  * know it ended — exactly the rows a replay does not produce, the
  * StreamingLocf span convention). Duplicate delivery of the current
  * day is idempotent (distinct-day sources may redeliver at a batch
  * boundary); a regressing day fails loudly (the StreamingPacker
  * convention). */
object StreamingStreaks {

  case class DayObs(userId: Long, day: Long)
  case class StreakRow(user_id: Long, start_day: Long, end_day: Long, len: Long)
  case class StreakState(start: Long, last: Long)

  /** obs(user_id, day) → one row per CLOSED streak. */
  def closedStreaks(obs: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[DayObs]
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[StreakRow]
    obs.select(col("user_id").as("userId"), col("day"))
      .as[DayObs]
      .groupByKey(_.userId)
      .transformWithState(new StreaksProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  private[streaming] class StreaksProcessor
      extends StatefulProcessor[Long, DayObs, StreakRow] {
    @transient private var st: ValueState[StreakState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[StreakState]("streak",
        Encoders.product[StreakState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[DayObs],
        tv: TimerValues): Iterator[StreakRow] = {
      val sorted = rows.map(_.day).toSeq.distinct.sorted
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else null
      if (s != null && sorted.head < s.last)
        throw new IllegalStateException(
          s"user $key: day ${sorted.head} arrived after ${s.last} was " +
            "already tracked — distinct active days must be delivered in " +
            "day order across micro-batches")
      val out = Seq.newBuilder[StreakRow]
      sorted.foreach { d =>
        if (s == null) s = StreakState(d, d)
        else if (d == s.last) () // idempotent redelivery
        else if (d == s.last + 1) s = StreakState(s.start, d)
        else {
          out += StreakRow(key, s.start, s.last, s.last - s.start + 1)
          s = StreakState(d, d)
        }
      }
      st.update(s)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[StreakRow] =
      Iterator.empty
  }
}
