package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Online hot-key detection: running per-key occurrence counts with a
  * one-shot emission when a key crosses `threshold` — the streaming
  * feeder for the batch df-cap lever
  * ([[graft.ext.Dedup.ngramJaccardPairsCapped]]): grams that go hot on
  * the live stream are exactly the stop-shingles the batch join must
  * drop, and learning them online means the next batch sweep starts
  * with yesterday's hot set instead of a full df pass.
  *
  * Built on transformWithState: typed ValueState per key, APPEND
  * output (a key emits exactly once, at the crossing — monotone
  * counts make that decision final, which is what append mode
  * requires). State is one long per distinct key seen; production
  * bounds it with the `ttl` parameter (state TTL requires
  * processing-time mode), so a key idle longer than the TTL is
  * forgotten and may re-emit — the standard sliding-freshness
  * trade-off for unbounded key domains at 100 TB/day.
  */
object StreamingHotKeys {

  case class KeyedItem(key: Long)
  case class HotKey(key: Long, count: Long)

  /** @param threshold emission point: first batch where count ≥ threshold
    * @param ttl       optional state TTL (null ⇒ no TTL, TimeMode.None) */
  def hotKeys(items: Dataset[KeyedItem], threshold: Long,
      ttl: java.time.Duration = null): Dataset[HotKey] = {
    implicit val outEnc = Encoders.product[HotKey]
    implicit val keyEnc = Encoders.scalaLong
    val timeMode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    items.groupByKey(_.key)
      .transformWithState(new HotKeyProcessor(threshold, ttl), timeMode, OutputMode.Append())
  }

  private class HotKeyProcessor(threshold: Long, ttl: java.time.Duration)
      extends StatefulProcessor[Long, KeyedItem, HotKey] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        if (ttl == null) TTLConfig.NONE else new TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[KeyedItem],
        tv: TimerValues): Iterator[HotKey] = {
      val before = if (count.exists()) count.get() else 0L
      val after = before + rows.size
      count.update(after)
      // one-shot: emit only on the batch that crosses the threshold
      if (before < threshold && after >= threshold) Iterator.single(HotKey(key, after))
      else Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[HotKey] = Iterator.empty
  }
}
