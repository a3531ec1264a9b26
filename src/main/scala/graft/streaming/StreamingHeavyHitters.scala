package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, ValueState}
import graft.functions.MisraGries.{MGAgg, MGSummary}

/** Bounded-state streaming heavy-hitter candidates — the live face of
  * the batch two-phase exact heavy hitters
  * ([[graft.ext.TextOps.heavyHitters]]), and the bounded complement
  * of [[StreamingHotKeys]]: HotKeys keeps ONE long per distinct key
  * ever seen (exact counts, state ∝ key domain, TTL as the pressure
  * valve); this operator keeps exactly `shards × m` counters total,
  * forever, by running a mergeable Misra–Gries summary per shard.
  *
  * Keys are routed to a fixed shard (hash mod `shards` — the
  * groupByKey that any stateful op needs, nothing more); each shard
  * folds its substream through the SAME reduce/merge the batch
  * Aggregator uses ([[graft.functions.MisraGries.MGAgg]]). Because
  * every occurrence of a key lands in one shard, a key with global
  * frequency > N/(m+1) exceeds its own shard's n_shard/(m+1) (n_shard
  * ≤ N), so the union of shard summaries is a guaranteed candidate
  * superset — the same bound as one merged batch sketch. Each
  * micro-batch the touched shards re-emit their current summary
  * (Update mode; the row is the shard's full state, so the latest
  * row per shard is the view) — merge them with
  * [[graft.functions.MisraGries.MGAgg.merge]] and exact-confirm
  * against a corpus count exactly as batch phase 2 does.
  * Spec-pinned: the merged streamed candidates confirm to the SAME
  * exact heavy-hitter set as the batch operator on a replayed
  * corpus. Requires the RocksDB state store provider
  * (transformWithState). */
object StreamingHeavyHitters {

  case class KeyedItem(item: String)

  /** One shard's current summary: retained counters + exact count of
    * items the shard has summarized. */
  case class ShardSummary(shard: Int, items: Map[String, Long], n: Long)

  def shardOf(item: String, shards: Int): Int = {
    val h = item.hashCode % shards
    if (h < 0) h + shards else h
  }

  /** @param m      Misra–Gries capacity per shard
    * @param shards fixed shard count (state = shards × m counters) */
  def candidates(items: Dataset[KeyedItem], m: Int, shards: Int): Dataset[ShardSummary] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    implicit val outEnc = Encoders.product[ShardSummary]
    implicit val keyEnc = Encoders.scalaInt
    items.groupByKey(r => shardOf(r.item, shards))
      .transformWithState(new ShardProcessor(m), TimeMode.None(), OutputMode.Update())
  }

  /** One exactly-confirmed heavy hitter. */
  case class Confirmed(item: String, cnt: Long)

  /** Phase-2 EXACT confirm composed onto the candidate stream — the
    * slowTraces stream-static shape ([[StreamingCriticalPath]]): each
    * emitted shard summary explodes its retained items and probes the
    * STATIC exact corpus counts (broadcast per micro-batch, zero added
    * state), keeping batch phase 2's integer rule `cnt·(m+1) > total`.
    * Soundness: every emitted row passed the exact global filter, so
    * nothing spurious ever streams out. Completeness: a true heavy
    * hitter always survives in its shard's final summary (the
    * Misra–Gries retention bound), so the last trigger emits it. The
    * DISTINCT confirmed rows after a corpus replay therefore equal the
    * batch [[graft.ext.TextOps.heavyHitters]] set exactly
    * (spec-pinned); items confirmed at earlier triggers are true
    * positives by soundness, just re-stated.
    *
    * `corpusCounts` is (item, cnt) — the batch-side exact ledger the
    * confirm joins against; at scale it is a bucketed staging table or
    * broadcast, exactly like slowTraces' anomaly baseline. */
  def confirmed(cands: Dataset[ShardSummary], corpusCounts: Dataset[Confirmed],
      total: Long, m: Int): Dataset[Confirmed] = {
    import org.apache.spark.sql.functions.{broadcast, col, explode}
    implicit val outEnc = Encoders.product[Confirmed]
    cands
      .select(explode(col("items")))
      .select(col("key").as("item"))
      .join(broadcast(corpusCounts.toDF()), Seq("item"))
      .filter(col("cnt") * (m + 1) > total)
      .select(col("item"), col("cnt"))
      .as[Confirmed]
  }

  private class ShardProcessor(m: Int)
      extends StatefulProcessor[Int, KeyedItem, ShardSummary] {
    @transient private lazy val agg = new MGAgg(m)
    @transient private var sum: ValueState[MGSummary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sum = getHandle.getValueState[MGSummary]("mg", Encoders.product[MGSummary],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[KeyedItem],
        tv: TimerValues): Iterator[ShardSummary] = {
      val cur = if (sum.exists()) sum.get() else agg.zero
      val next = rows.foldLeft(cur)((b, r) => agg.reduce(b, r.item))
      sum.update(next)
      Iterator.single(ShardSummary(shard, next.items, next.n))
    }

    override def handleExpiredTimer(shard: Int, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ShardSummary] = Iterator.empty
  }
}
