package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch `p_profile` registry query: a live
  * per-column profile of the event stream (row/null counts, numeric
  * min/max, distinct count) with BOUNDED state — the data-quality
  * monitor that runs beside an ingest forever.
  *
  * The one profile statistic that is naturally unbounded — distinct
  * count — is carried as a KMV (k-minimum-values) sketch: per column
  * the state holds at most k hashes (plus four counters), no matter
  * how much history has flowed. Below k distincts the sketch IS the
  * exact value set, so the emitted count is exact; past k it reports
  * the (k−1)·2^56/h_k estimator — the same estimator, on the same
  * portable hash, as the batch `a_daily_distinct`/`t_kmv_distinct`
  * rows, so a replay agrees with a batch computation of the sketch
  * bit-for-bit (spec-pinned via an in-memory replica).
  *
  * Rows explode into (column, payload) pairs BEFORE keying (a
  * stateless projection), so the shuffle key domain is the five
  * column names — the same (layout-tiny-key) trade the batch
  * profiler makes, acceptable because per-key work is O(batch). */
object StreamingProfiler {

  case class ColObs(colName: String, dval: Option[Double], h: Long,
      isNull: Boolean)
  case class ColProfile(col_name: String, n_rows: Long, n_nulls: Long,
      n_distinct_est: Long, min_val: Option[Double], max_val: Option[Double])
  case class ProfState(n: Long, nulls: Long, mn: Double, mx: Double,
      hasNum: Boolean, hashes: Array[Long])

  /** events(event_id, ts, user_id, event_type, value, props) → one
    * updated profile row per column per micro-batch. `k` caps the
    * sketch. */
  def profile(events: DataFrame, k: Int): DataFrame = {
    implicit val outEnc = Encoders.product[ColProfile]
    keyed(events).transformWithState(new ProfileProcessor(k),
      TimeMode.None(), OutputMode.Append()).toDF()
  }

  /** Timer-driven variant — how a monitor is actually consumed:
    * instead of one row per column per micro-batch (chatty at
    * second-level triggers), the profile is emitted on a processing-
    * time CADENCE — every `emitEveryMs` — via `handleExpiredTimer`.
    * Input rows only fold into state (same bounded KMV state as
    * [[profile]]); the first row of a column arms its timer, each
    * expiry emits the profile-so-far and re-arms. Emission cadence is
    * therefore declared once, not coupled to the trigger interval;
    * state size is unchanged (the timer is runtime metadata).
    *
    * Deploy with an explicit trigger interval (e.g. ProcessingTime
    * "1 minute"): while a processing-time timer is registered the
    * engine keeps scheduling micro-batches to check expiry, so the
    * default run-ASAP trigger busy-loops empty batches between
    * firings — and `processAllAvailable` never latches (it sees the
    * pending timer as available work). Observe through the sink and
    * `recentProgress`, as a monitor is consumed anyway. */
  def profileEvery(events: DataFrame, k: Int, emitEveryMs: Long): DataFrame = {
    implicit val outEnc = Encoders.product[ColProfile]
    keyed(events).transformWithState(new TimedProfileProcessor(k, emitEveryMs),
      TimeMode.ProcessingTime(), OutputMode.Append()).toDF()
  }

  private def keyed(events: DataFrame) = {
    implicit val inEnc = Encoders.product[ColObs]
    implicit val keyEnc = Encoders.STRING
    val specs = Seq(
      ("event_id", col("event_id").cast("double"), col("event_id").cast("string")),
      ("user_id", col("user_id").cast("double"), col("user_id").cast("string")),
      ("value", col("value"), col("value").cast("string")),
      ("event_type", lit(null).cast("double"), col("event_type")),
      ("props", lit(null).cast("double"), col("props")))
    events.select(explode(array(specs.map { case (n, d, sv) =>
        struct(lit(n).as("colName"), d.as("dval"),
          coalesce(graft.codec.Codecs.portableHash(sv), lit(0L)).as("h"),
          sv.isNull.as("isNull"))
      }: _*)).as("c"))
      .select(col("c.colName").as("colName"), col("c.dval").as("dval"),
        col("c.h").as("h"), col("c.isNull").as("isNull"))
      .as[ColObs]
      .groupByKey(_.colName)
  }

  private[streaming] abstract class BaseProfileProcessor(k: Int)
      extends StatefulProcessor[String, ColObs, ColProfile] {
    @transient protected var st: ValueState[ProfState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ProfState]("prof",
        Encoders.product[ProfState], TTLConfig.NONE)

    /** Fold a micro-batch's observations into state; returns the
      * updated state. The sketch is tiny (≤ k longs); fold through a
      * sorted set. */
    protected def fold(rows: Iterator[ColObs]): ProfState = {
      var s = if (st.exists()) st.get()
        else ProfState(0L, 0L, Double.MaxValue, Double.MinValue, false,
          Array.empty[Long])
      val hs = scala.collection.mutable.TreeSet.from(s.hashes)
      rows.foreach { o =>
        s = s.copy(n = s.n + 1, nulls = s.nulls + (if (o.isNull) 1L else 0L))
        if (!o.isNull) {
          o.dval.foreach { d =>
            s = s.copy(mn = math.min(s.mn, d), mx = math.max(s.mx, d),
              hasNum = true)
          }
          hs.add(o.h)
          while (hs.size > k) hs.remove(hs.last)
        }
      }
      s = s.copy(hashes = hs.toArray)
      st.update(s)
      s
    }

    /** Render the profile row for the current state — the batch
      * estimator's rounding (HALF_UP; positive, so any tie rounds the
      * same way as Spark round). */
    protected def render(key: String, s: ProfState): ColProfile = {
      val hs = s.hashes
      val est =
        if (hs.length < k) hs.length.toLong
        else BigDecimal((k - 1).toDouble * 7.2057594037927936e16 / hs.last)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      ColProfile(key, s.n, s.nulls, est,
        if (s.hasNum) Some(r4(s.mn)) else None,
        if (s.hasNum) Some(r4(s.mx)) else None)
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ColProfile] =
      Iterator.empty
  }

  /** Emit the updated profile every micro-batch. */
  private[streaming] class ProfileProcessor(k: Int)
      extends BaseProfileProcessor(k) {
    override def handleInputRows(key: String, rows: Iterator[ColObs],
        tv: TimerValues): Iterator[ColProfile] =
      Iterator.single(render(key, fold(rows)))
  }

  /** Emit the profile only on the declared processing-time cadence:
    * input rows fold silently; a column's first observation arms its
    * timer `emitEveryMs` out, and each expiry emits the profile-so-far
    * and re-arms. The timer list holds exactly one entry per live
    * column key. */
  private[streaming] class TimedProfileProcessor(k: Int, emitEveryMs: Long)
      extends BaseProfileProcessor(k) {
    override def handleInputRows(key: String, rows: Iterator[ColObs],
        tv: TimerValues): Iterator[ColProfile] = {
      fold(rows)
      if (!getHandle.listTimers().hasNext)
        getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + emitEveryMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ColProfile] = {
      getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + emitEveryMs)
      Iterator.single(render(key,
        if (st.exists()) st.get()
        else ProfState(0L, 0L, Double.MaxValue, Double.MinValue, false,
          Array.empty[Long])))
    }
  }
}
