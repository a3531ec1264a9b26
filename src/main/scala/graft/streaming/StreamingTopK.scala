package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Exact streaming top-k leaderboard over keyed additive increments —
  * the live face of the batch TakeOrdered heads
  * ([[graft.SparkEntry]]'s a_rank_churn / a_top_orders shape): revenue
  * per part, views per document, bytes per tenant, maintained
  * incrementally with a deterministic (total desc, key) order.
  *
  * Exactness argument (the reason shard-local boards merge to the
  * TRUE global top-k): every occurrence of a key hashes to ONE shard,
  * so a shard's ledger total IS the key's global total, and the global
  * top-k is a subset of the union of shard-local top-ks — merging the
  * ≤ shards·k board rows reproduces the exact leaderboard, the same
  * superset argument [[StreamingHeavyHitters]] makes for Misra–Gries
  * candidates, here with exact totals instead of a frequency bound.
  *
  * Incremental maintenance is O(touched·log k) per micro-batch, no
  * ledger scan: increments are REQUIRED non-negative (loud failure —
  * the disorder-refusal convention), so totals are monotone and the
  * new top-k is provably contained in (old board ∪ touched keys): an
  * untouched key outside the board lost to k unchanged-or-grown board
  * entries last batch and still loses now.
  *
  * State: a [[MapState]] ledger (one long per distinct key — state ∝
  * key dimension, the [[StreamingHotKeys]] ledger shape; bound
  * unbounded domains there with TTL, here the leaderboard domain is a
  * dimension table) plus a k-pair cached board. Update-mode output:
  * each touched shard re-emits its full board, so the latest row per
  * shard is the view and [[merged]] folds shard views into the
  * serveable leaderboard. */
object StreamingTopK {

  case class Inc(key: String, delta: Long)

  /** A shard's current leaderboard, ordered (total desc, key asc);
    * `ver` increments per emission so a consumer of the update stream
    * selects the latest view per shard without relying on sink
    * ordering. */
  case class Board(shard: Int, ver: Long, keys: Seq[String], totals: Seq[Long])

  def shardOf(key: String, shards: Int): Int = {
    val h = key.hashCode % shards
    if (h < 0) h + shards else h
  }

  /** @param k      leaderboard size per shard (and globally after merge)
    * @param shards fixed shard count; parallelism of the stateful op */
  def leaderboards(incs: Dataset[Inc], k: Int, shards: Int): Dataset[Board] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    implicit val outEnc = Encoders.product[Board]
    implicit val keyEnc = Encoders.scalaInt
    incs.groupByKey(r => shardOf(r.key, shards))
      .transformWithState(new BoardProcessor(k, allowDecrements = false),
        TimeMode.None(), OutputMode.Update())
  }

  /** Decrement-tolerant variant — the documented trade behind
    * [[leaderboards]]' increment-only require. Deltas may be negative
    * (refunds, corrections, retractions); per-key TOTALS must stay
    * ≥ 0 (a negative total is a ledger bug and refuses loudly, the
    * disorder convention). A micro-batch that applies any negative
    * delta to a shard invalidates the O(k) containment argument — a
    * shrunk board entry can be overtaken by ANY untouched ledger key
    * — so exactly those shard-batches rebuild their board with a full
    * ledger rescan (O(ledger), LAZY: only when a decrement actually
    * arrives); increment-only batches keep the O(touched·log k)
    * incremental path. */
  def leaderboardsDelta(incs: Dataset[Inc], k: Int, shards: Int): Dataset[Board] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    implicit val outEnc = Encoders.product[Board]
    implicit val keyEnc = Encoders.scalaInt
    incs.groupByKey(r => shardOf(r.key, shards))
      .transformWithState(new BoardProcessor(k, allowDecrements = true),
        TimeMode.None(), OutputMode.Update())
  }

  /** Fold the latest per-shard boards into the exact global top-k. */
  def merged(boards: Seq[Board], k: Int): Seq[(String, Long)] =
    boards.flatMap(b => b.keys.zip(b.totals))
      .sortBy { case (key, t) => (-t, key) }.take(k)

  private class BoardProcessor(k: Int, allowDecrements: Boolean)
      extends StatefulProcessor[Int, Inc, Board] {
    @transient private var ledger: MapState[String, Long] = _
    @transient private var board: ValueState[Board] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ledger = getHandle.getMapState[String, Long]("ledger",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      board = getHandle.getValueState[Board]("board",
        Encoders.product[Board], TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[Inc],
        tv: TimerValues): Iterator[Board] = {
      val touched = scala.collection.mutable.Map.empty[String, Long]
      rows.foreach { r =>
        if (!allowDecrements) require(r.delta >= 0L,
          s"StreamingTopK is increment-only; got delta ${r.delta} for key " +
            s"${r.key} — decrements would invalidate the O(k) cached board " +
            "(leaderboardsDelta is the decrement-tolerant entry point)")
        touched(r.key) = touched.getOrElse(r.key, 0L) + r.delta
      }
      val newTotals = touched.map { case (key, d) =>
        val nt = (if (ledger.containsKey(key)) ledger.getValue(key) else 0L) + d
        require(nt >= 0L,
          s"StreamingTopK: total for key $key went negative ($nt) — a " +
            "retraction exceeded the recorded total; the ledger is corrupt")
        ledger.updateValue(key, nt)
        key -> nt
      }
      val prev = if (board.exists()) board.get() else Board(shard, 0L, Nil, Nil)
      val next =
        if (touched.valuesIterator.exists(_ < 0L)) {
          // a decrement breaks containment (any untouched key may now
          // overtake a shrunk board entry): rebuild from the ledger —
          // the lazy full-rescan path, paid only on decrement batches
          val all = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          ledger.iterator().foreach { case (key, t) => all += (key -> t) }
          all.sortBy { case (key, t) => (-t, key) }.take(k).toSeq
        } else {
          val keep = prev.keys.zip(prev.totals)
            .filterNot { case (key, _) => newTotals.contains(key) }
          (keep ++ newTotals).toSeq
            .sortBy { case (key, t) => (-t, key) }.take(k)
        }
      val nb = Board(shard, prev.ver + 1L, next.map(_._1), next.map(_._2))
      board.update(nb)
      Iterator.single(nb)
    }

    override def handleExpiredTimer(shard: Int, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Board] = Iterator.empty
  }
}
