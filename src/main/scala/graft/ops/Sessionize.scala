package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: the session-ID assignment form of
  * session windowing (a_session_window aggregates Spark's
  * session_window; this derives explicit per-session rows the way an
  * event-analytics store would). Shared by the `a_sessionize` registry
  * query and the [[graft.streaming.StreamingSessionize]] twin's
  * batch-agreement spec.
  */
object Sessionize {

  /** events(user_id, ts: timestamp, event_id, event_type, value) →
    * one row per (user, session): session index (1-based, in time
    * order), start/end/duration in epoch micros, event count, distinct
    * event types, fixed-point value sum. A session breaks when
    * consecutive events (per user, (ts, event_id) order) are more than
    * `gapUs` apart. Exact microsecond arithmetic end to end.
    *
    * Scale shape: ONE user-keyed window spec — data-sized key domain;
    * the lag and the running break-sum share the spec, so there is one
    * sort and one WindowExec — followed by a (user, session)-keyed
    * partial agg. */
  /** Per-EVENT session assignment — the substrate [[sessions]]
    * aggregates and the journey/path consumers read directly: every
    * event row plus its 1-based `sess_idx`. One user-keyed window
    * spec shared by the lag and the running break-sum. */
  def assigned(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 1000).cast("long").as("v_fx"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessions(events: DataFrame, gapUs: Long): DataFrame = {
    assigned(events, gapUs)
      .groupBy(col("user_id"), col("sess_idx"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("v_fx")).as("value_fx"))
  }
}
