package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.{Board, Inc}

/** Replay pins for the exact streaming leaderboard: hand-frame
  * maintenance across batches, merged shard boards equal the batch
  * TakeOrdered top-k on a replayed corpus, and decrements refuse
  * loudly. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDB(body: => Unit): Unit = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  /** Replays slices and returns the latest board per shard. */
  private def replay(slices: Seq[Seq[Inc]], k: Int, shards: Int,
      name: String): Seq[Board] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Inc]
    val q = StreamingTopK.leaderboards(input.toDS(), k, shards)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      slices.foreach { s => input.addData(s); q.processAllAvailable() }
      spark.table(name).as[Board].collect().toSeq
        .groupBy(_.shard).values.map(_.maxBy(_.ver)).toSeq
    } finally q.stop()
  }

  test("hand replay: the board tracks monotone totals exactly") {
    withRocksDB {
      val boards = replay(Seq(
        Seq(Inc("a", 5L), Inc("b", 3L), Inc("c", 1L)),
        Seq(Inc("c", 9L), Inc("d", 2L)),
        Seq(Inc("b", 8L))), k = 2, shards = 1, "topk_hand")
      assert(boards.length === 1)
      // totals: a=5 b=11 c=10 d=2 -> top2 = b(11), c(10)
      assert(boards.head.keys === Seq("b", "c"))
      assert(boards.head.totals === Seq(11L, 10L))
      assert(boards.head.ver === 3L)
    }
  }

  test("ties break by key ascending, deterministically") {
    withRocksDB {
      val boards = replay(Seq(
        Seq(Inc("z", 7L), Inc("m", 7L), Inc("a", 7L))),
        k = 2, shards = 1, "topk_ties")
      assert(StreamingTopK.merged(boards, 2) ===
        Seq(("a", 7L), ("m", 7L)))
    }
  }

  test("merged shard boards equal the batch TakeOrdered top-k on a replay") {
    withRocksDB {
      val dir = "/root/testdata/sf0.001"
      val incs = SparkEntry.T(spark, dir, "lineitem")
        .select(col("l_partkey").cast("string").as("key"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("delta"))
        .as[Inc].collect().toSeq
      val batch = incs.groupBy(_.key).view.mapValues(_.map(_.delta).sum).toSeq
        .sortBy { case (key, t) => (-t, key) }.take(10)
      val boards = replay(incs.grouped(500).toSeq, k = 10, shards = 4,
        "topk_sf")
      assert(boards.map(_.shard).distinct.length === boards.length)
      assert(StreamingTopK.merged(boards, 10) === batch)
      assert(batch.nonEmpty)
    }
  }

  test("live serve: requests score against the freshest published board") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val incs = MemoryStream[Inc]
      val reqs = MemoryStream[String]
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(String, Option[Long], Option[Long], Boolean)]
      val sink: graft.streaming.Pipeline.Sink = (_, df) =>
        got.synchronized {
          got ++= df.collect().map { r =>
            (r.getAs[String]("key"),
              Option(r.getAs[java.lang.Long]("total")).map(_.longValue),
              Option(r.getAs[java.lang.Long]("rank")).map(_.longValue),
              r.getAs[Boolean]("in_topk"))
          }
        }
      val (pub, serve) = graft.streaming.Pipeline.topkServe(
        incs.toDS(), reqs.toDS().toDF("key"), k = 2, shards = 2,
        "topk_serve_view")(sink)
      try {
        // cold start: nothing published yet -> in_topk = false
        reqs.addData("a"); serve.processAllAvailable()
        assert(got.toSeq === Seq(("a", None, None, false)))
        got.clear()
        // batch 1: a=5 b=3 c=1 -> board (a,5),(b,3)
        incs.addData(Seq(Inc("a", 5L), Inc("b", 3L), Inc("c", 1L)))
        pub.processAllAvailable()
        reqs.addData("a", "c"); serve.processAllAvailable()
        assert(got.toSet === Set(
          ("a", Some(5L), Some(1L), true), ("c", None, None, false)))
        got.clear()
        // batch 2 flips the leader: c += 9 -> board (c,10),(a,5);
        // the SAME request keys now answer differently
        incs.addData(Seq(Inc("c", 9L)))
        pub.processAllAvailable()
        reqs.addData("a", "c", "b"); serve.processAllAvailable()
        assert(got.toSet === Set(
          ("a", Some(5L), Some(2L), true),
          ("c", Some(10L), Some(1L), true),
          ("b", None, None, false)))
      } finally { serve.stop(); pub.stop() }
    }
  }

  test("table-backed serve replays equal to the view form; board outlives the streams") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val incs = MemoryStream[Inc]
      val reqs = MemoryStream[String]
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(String, Option[Long], Option[Long], Boolean)]
      val sink: graft.streaming.Pipeline.Sink = (_, df) =>
        got.synchronized {
          got ++= df.collect().map { r =>
            (r.getAs[String]("key"),
              Option(r.getAs[java.lang.Long]("total")).map(_.longValue),
              Option(r.getAs[java.lang.Long]("rank")).map(_.longValue),
              r.getAs[Boolean]("in_topk"))
          }
        }
      val (pub, serve) = graft.streaming.Pipeline.topkServeTable(
        incs.toDS(), reqs.toDS().toDF("key"), k = 2, shards = 2,
        "topk_serve_table")(sink)
      try {
        // identical script to the view-backed test; identical answers
        reqs.addData("a"); serve.processAllAvailable()
        assert(got.toSeq === Seq(("a", None, None, false)))
        got.clear()
        incs.addData(Seq(Inc("a", 5L), Inc("b", 3L), Inc("c", 1L)))
        pub.processAllAvailable()
        reqs.addData("a", "c"); serve.processAllAvailable()
        assert(got.toSet === Set(
          ("a", Some(5L), Some(1L), true), ("c", None, None, false)))
        got.clear()
        incs.addData(Seq(Inc("c", 9L)))
        pub.processAllAvailable()
        reqs.addData("a", "c", "b"); serve.processAllAvailable()
        assert(got.toSet === Set(
          ("a", Some(5L), Some(2L), true),
          ("c", Some(10L), Some(1L), true),
          ("b", None, None, false)))
      } finally { serve.stop(); pub.stop() }
      // the publication SURVIVES the streams (and would survive the
      // driver: it is a managed parquet table, not session state);
      // every publication carries the rank-0 heartbeat row, and the
      // PUBLIC reader view (topkBoard) strips it for external apps
      val raw = spark.table("topk_serve_table").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(raw.exists(_._3 === 0L),
        s"publications must carry the rank-0 heartbeat row: $raw")
      val after = graft.streaming.Pipeline.topkBoard(spark, "topk_serve_table")
        .orderBy("rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(after === Seq(("c", 10L, 1L), ("a", 5L, 2L)),
        "the public board view must serve exactly the board rows")
    }
  }

  test("table serve survives a driver restart: init is create-if-absent") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      // "previous driver" publishes a board
      graft.sources.StagingTables.writeSmall(
        Seq(("x", 9L, 1L)).toDF("key", "total", "rank"), "topk_restart_table")
      val incs = MemoryStream[Inc]
      val reqs = MemoryStream[String]
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
      val sink: graft.streaming.Pipeline.Sink = (_, df) =>
        got.synchronized {
          got ++= df.collect().map(r =>
            (r.getAs[String]("key"), r.getAs[Boolean]("in_topk")))
        }
      // "restarted driver" wires the same table; before ANY new
      // publication the surviving board must answer — startup must not
      // overwrite it with an empty frame
      val (pub, serve) = graft.streaming.Pipeline.topkServeTable(
        incs.toDS(), reqs.toDS().toDF("key"), k = 2, shards = 2,
        "topk_restart_table")(sink)
      try {
        reqs.addData("x", "y"); serve.processAllAvailable()
        assert(got.toSet === Set(("x", true), ("y", false)),
          s"surviving board erased at restart: ${got.toSeq}")
      } finally { serve.stop(); pub.stop() }
    }
  }

  test("mid-swap reads serve the last good board instead of failing") {
    val lastGood = new java.util.concurrent.atomic.AtomicReference[
      Seq[(String, Long, Long)]](Seq.empty)
    graft.sources.StagingTables.writeSmall(
      Seq(("a", 7L, 1L)).toDF("key", "total", "rank"), "topk_swap_table")
    val first = graft.streaming.Pipeline
      .boardSnapshot(spark, "topk_swap_table", lastGood).collect()
    assert(first.map(_.getString(0)).toSeq === Seq("a"))
    // the drop+recreate window of a non-transactional overwrite:
    // resolution fails — the snapshot must keep serving the last board
    spark.sql("DROP TABLE topk_swap_table")
    val dropped = graft.streaming.Pipeline
      .boardSnapshot(spark, "topk_swap_table", lastGood).collect()
    assert(dropped.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("a", 7L, 1L)), "mid-swap read must serve the last good board")
    // an EMPTY listing (0 rows) after a board was seen is the same
    // window — every committed publication carries the rank-0
    // heartbeat, so nothing legitimate ever lists 0 rows
    graft.sources.StagingTables.writeSmall(
      Seq.empty[(String, Long, Long)].toDF("key", "total", "rank"),
      "topk_swap_table")
    val empty = graft.streaming.Pipeline
      .boardSnapshot(spark, "topk_swap_table", lastGood).collect()
    assert(empty.map(_.getString(0)).toSeq === Seq("a"),
      "post-publication empty listing must serve the last good board")
    // a published EMPTY board — heartbeat row, no data rows — is a
    // COMMITTED publication and must be served empty, not shadowed by
    // the stale last-good forever (the round-12 advice case)
    graft.sources.StagingTables.writeSmall(
      Seq((graft.streaming.Pipeline.BoardVersionKey, 3L, 0L))
        .toDF("key", "total", "rank"), "topk_swap_table")
    val publishedEmpty = graft.streaming.Pipeline
      .boardSnapshot(spark, "topk_swap_table", lastGood).collect()
    assert(publishedEmpty.isEmpty,
      "a heartbeat-only publication is a real empty board, serve it empty")
    // and the snapshot moved on: a subsequent swap window now falls
    // back to the EMPTY board, not the long-gone ("a") one
    spark.sql("DROP TABLE topk_swap_table")
    assert(graft.streaming.Pipeline
      .boardSnapshot(spark, "topk_swap_table", lastGood).collect().isEmpty)
  }

  private def replayDelta(slices: Seq[Seq[Inc]], k: Int, shards: Int,
      name: String): Seq[Board] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Inc]
    val q = StreamingTopK.leaderboardsDelta(input.toDS(), k, shards)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      slices.foreach { s => input.addData(s); q.processAllAvailable() }
      spark.table(name).as[Board].collect().toSeq
        .groupBy(_.shard).values.map(_.maxBy(_.ver)).toSeq
    } finally q.stop()
  }

  test("delta variant: a decrement resurfaces an off-board key via rescan") {
    withRocksDB {
      val boards = replayDelta(Seq(
        Seq(Inc("a", 10L), Inc("b", 8L), Inc("c", 5L)), // board: a, b
        Seq(Inc("a", -7L))),                            // a -> 3
        k = 2, shards = 1, "topk_delta_rescan")
      // the O(k) containment path would answer (b, a) and lose c;
      // the decrement batch's ledger rescan restores the truth
      assert(boards.head.keys === Seq("b", "c"))
      assert(boards.head.totals === Seq(8L, 5L))
    }
  }

  test("delta variant: merged boards equal batch totals under mixed deltas") {
    withRocksDB {
      val dir = "/root/testdata/sf0.001"
      val base = SparkEntry.T(spark, dir, "lineitem")
        .select(col("l_partkey").cast("string").as("key"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("delta"))
        .as[Inc].collect().toSeq
      // retract 40% of every third key's first increment in a later slice
      val retractions = base.zipWithIndex.collect {
        case (Inc(k0, d), i) if i % 3 == 0 => Inc(k0, -(d * 2 / 5))
      }
      val incs = base ++ retractions
      val batch = incs.groupBy(_.key).view.mapValues(_.map(_.delta).sum).toSeq
        .sortBy { case (key, t) => (-t, key) }.take(10)
      val boards = replayDelta(
        base.grouped(400).toSeq ++ retractions.grouped(150).toSeq,
        k = 10, shards = 4, "topk_delta_sf")
      assert(StreamingTopK.merged(boards, 10) === batch)
    }
  }

  test("delta variant: a retraction below zero refuses loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Inc]
      val q = StreamingTopK.leaderboardsDelta(input.toDS(), 2, 1)
        .writeStream.format("memory").queryName("topk_delta_neg")
        .outputMode("update").start()
      try {
        input.addData(Seq(Inc("a", 3L)))
        q.processAllAvailable()
        input.addData(Seq(Inc("a", -5L)))
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("went negative")))
      } finally q.stop()
    }
  }

  test("a negative increment refuses loudly") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Inc]
      val q = StreamingTopK.leaderboards(input.toDS(), 2, 1)
        .writeStream.format("memory").queryName("topk_neg")
        .outputMode("update").start()
      try {
        input.addData(Seq(Inc("a", -1L)))
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(e.getMessage.contains("increment-only") ||
          Option(e.getCause).exists(_.getMessage.contains("increment-only")))
      } finally q.stop()
    }
  }
}
