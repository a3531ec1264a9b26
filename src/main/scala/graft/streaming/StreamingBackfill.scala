package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** The lambda-architecture REPAIR leg of the batch `a_gap_fill`
  * registry query, completing [[StreamingLocf]]: linear interpolation
  * needs the NEXT observation, so a live stream first publishes the
  * provisional carried-forward value (the LOCF twin) and then — the
  * moment the right-hand anchor arrives — emits one correction row
  * per gap day carrying the interpolated value, the provisional value
  * it supersedes, and the signed repair delta a downstream sink
  * applies as an upsert.
  *
  * The arithmetic is byte-identical to the batch interp leg: exact
  * integer anchors, ONE double multiply-divide per gap day, HALF_UP
  * rounding at emission (positive domain — the a_ewma convention), so
  * replaying closed daily rows in order reproduces the batch
  * `interp_fx` column row-for-row on each series' observed span
  * (spec-pinned; the batch's edge-extrapolated rows outside the span
  * are exactly the rows no causal stream can produce). State per
  * series is ONE (day, value) anchor; a gap burst emits its repairs
  * in the batch that closes the gap. Cross-batch day order is
  * enforced loudly (the StreamingPacker convention). */
object StreamingBackfill {

  case class DailyObs(etype: String, day: Long, vFx: Long)

  /** `is_fill` distinguishes repairs from anchor pass-throughs;
    * repairs carry the provisional LOCF value they replace and the
    * delta (interp − provisional) the sink upserts. */
  case class RepairRow(event_type: String, day: Long, interp_fx: Long,
      provisional_fx: Long, delta_fx: Long, is_fill: Boolean)

  case class AnchorState(lastDay: Long, lastVal: Long)

  /** obs(event_type, day, v_fx) → anchors as they arrive plus one
    * correction row per repaired gap day. */
  def repairs(obs: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[DailyObs]
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[RepairRow]
    obs.select(col("event_type").as("etype"), col("day"),
        col("v_fx").as("vFx"))
      .as[DailyObs]
      .groupByKey(_.etype)
      .transformWithState(new BackfillProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  private[streaming] class BackfillProcessor
      extends StatefulProcessor[String, DailyObs, RepairRow] {
    @transient private var st: ValueState[AnchorState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AnchorState]("anchor",
        Encoders.product[AnchorState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DailyObs],
        tv: TimerValues): Iterator[RepairRow] = {
      val sorted = rows.toSeq.sortBy(_.day)
      if (sorted.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else null
      if (s != null && sorted.head.day <= s.lastDay)
        throw new IllegalStateException(
          s"series $key: day ${sorted.head.day} arrived after ${s.lastDay} " +
            "was already repaired — closed daily rows must be delivered in " +
            "day order across micro-batches")
      val out = Seq.newBuilder[RepairRow]
      sorted.foreach { r =>
        if (s != null) {
          val (pd, pv, nd, nv) = (s.lastDay, s.lastVal, r.day, r.vFx)
          ((pd + 1) until nd).foreach { d =>
            val interp = Math.round(
              pv + (nv - pv) * ((d - pd).toDouble / (nd - pd).toDouble))
            out += RepairRow(key, d, interp, pv, interp - pv, is_fill = true)
          }
        }
        out += RepairRow(key, r.day, r.vFx, r.vFx, 0L, is_fill = false)
        s = AnchorState(r.day, r.vFx)
      }
      st.update(s)
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[RepairRow] =
      Iterator.empty
  }
}
