package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.functions.MisraGries.{MGAgg, MGSummary}
import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.{KeyedItem, ShardSummary}

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // the HeavyHittersSpec corpus: 'hot hot' is far above threshold,
  // enough filler that per-shard capacity m=4 must evict
  private val docs = Seq(
    (1L, "hot hot hot hot hot hot hot hot"),
    (2L, "hot hot hot hot a b c d e f"),
    (3L, "g h i j k l m n o p q r"))

  private def bigrams: Seq[String] = docs.flatMap { case (_, text) =>
    val tk = text.split("\\s+").toSeq
    tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
  }

  test("streamed shard summaries confirm to the batch exact heavy hitters") {
    implicit val sqlCtx = spark.sqlContext
    // the transformWithState operator requires the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val m = 4; val shards = 2
    val input = MemoryStream[KeyedItem]
    val out = StreamingHeavyHitters.candidates(input.toDS(), m, shards)
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    try {
      // replay in two micro-batches so shard state genuinely carries over
      val (first, rest) = bigrams.splitAt(bigrams.size / 2)
      input.addData(first.map(KeyedItem): _*)
      q.processAllAvailable()
      input.addData(rest.map(KeyedItem): _*)
      q.processAllAvailable()
      // latest row per shard is that shard's current summary
      val latest = spark.table("hh_stream").as[ShardSummary].collect()
        .groupBy(_.shard).map(_._2.last).toSeq
      val agg = new MGAgg(m)
      val merged = latest.foldLeft(agg.zero)((b, s) =>
        agg.merge(b, MGSummary(s.items, s.n)))
      assert(merged.n === bigrams.size.toLong)
      // guaranteed superset: every item above N/(m+1) is a candidate
      val exact = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = exact.filter { case (_, c) => c * (m + 1) > bigrams.size }
      heavy.keys.foreach(k => assert(merged.items.contains(k),
        s"candidate set lost heavy item $k"))
      // phase-2 confirm over the streamed candidates = the batch operator
      val confirmed = merged.items.keySet
        .filter(k => exact(k) * (m + 1) > bigrams.size.toLong)
        .map(k => (k, exact(k)))
      val batch = TextOps.heavyHitters(docs.toDF("doc_id", "text"), m)
        .as[(String, Long)].collect().toSet
      assert(confirmed === batch)
      // bounded state: no shard retains more than m counters
      latest.foreach(s => assert(s.items.size <= m))
    } finally q.stop()
  }

  test("stream-static exact confirm emits exactly the batch heavy hitters") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val m = 4; val shards = 2
    val exact = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val counts = exact.toSeq.map { case (k, c) =>
      StreamingHeavyHitters.Confirmed(k, c) }.toDS()
    val input = MemoryStream[KeyedItem]
    val out = StreamingHeavyHitters.confirmed(
      StreamingHeavyHitters.candidates(input.toDS(), m, shards),
      counts, bigrams.size.toLong, m)
    val q = out.writeStream.format("memory").queryName("hh_confirmed")
      .outputMode("update").start()
    try {
      val (first, rest) = bigrams.splitAt(bigrams.size / 2)
      input.addData(first.map(KeyedItem): _*)
      q.processAllAvailable()
      input.addData(rest.map(KeyedItem): _*)
      q.processAllAvailable()
      val streamed = spark.table("hh_confirmed")
        .as[StreamingHeavyHitters.Confirmed].collect().toSet
      val batch = TextOps.heavyHitters(docs.toDF("doc_id", "text"), m)
        .as[(String, Long)].collect().toSet
      assert(streamed.map(c => (c.item, c.cnt)) === batch,
        "distinct confirmed rows after replay must equal the batch exact set")
    } finally q.stop()
  }

  test("shard routing is total and stable") {
    val ks = Seq("a b", "hot hot", "q r", "", "x")
    ks.foreach { k =>
      val s = StreamingHeavyHitters.shardOf(k, 3)
      assert(s >= 0 && s < 3)
      assert(s === StreamingHeavyHitters.shardOf(k, 3))
    }
  }
}
