package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Pipeline

/** Replay pins for the windowed PSI monitor: batch equality on a
  * replay, the drifted-window alarm fires and the matched window
  * stays quiet, and degenerate references refuse loudly. */
class StreamingPsiSpec extends SparkSpec {
  import spark.implicits._

  private val uniform = Seq.fill(10)(0.1)
  private val t0 = 1700000040000L // minute-aligned

  private def obs(offS: Long, p4: Long) = (new Timestamp(t0 + offS * 1000L), p4)

  test("streaming window PSI equals the batch computation on a replay") {
    implicit val sqlCtx = spark.sqlContext
    // window 1: spread over deciles; window 2: collapsed into bucket 0
    val fixture = (0 to 9).map(b => obs(b.toLong, b * 1000L + 500L)) ++
      Seq(obs(70, 100L), obs(75, 200L), obs(80, 300L))
    val expected = Pipeline.psiMonitor(fixture.toDF("ts", "p4"), uniform,
        "2 hours", "1 minute", 0.25)
      .as[(Long, Long, Double, Boolean)].collect().toSet

    val input = MemoryStream[(Timestamp, Long)]
    val q = Pipeline.psiMonitor(input.toDF().toDF("ts", "p4"), uniform,
        "10 seconds", "1 minute", 0.25)
      .writeStream.format("memory").queryName("psi_stream")
      .outputMode("append").start()
    try {
      fixture.grouped(4).foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(obs(3600, 0L)); q.processAllAvailable()
      val streamed = spark.table("psi_stream")
        .as[(Long, Long, Double, Boolean)].collect()
        .filter(_._1 < (t0 + 3000000L) * 1000L).toSet
      assert(streamed === expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("collapsed scores alarm; spread scores stay quiet") {
    implicit val sqlCtx = spark.sqlContext
    val fixture = (0 to 9).map(b => obs(b.toLong, b * 1000L + 500L)) ++
      (0 to 9).map(i => obs(70 + i.toLong, 50L))
    val input = MemoryStream[(Timestamp, Long)]
    val q = Pipeline.psiMonitor(input.toDF().toDF("ts", "p4"), uniform,
        "10 seconds", "1 minute", 0.25)
      .writeStream.format("memory").queryName("psi_alert")
      .outputMode("append").start()
    try {
      input.addData(fixture); q.processAllAvailable()
      input.addData(obs(3600, 0L)); q.processAllAvailable()
      val rows = spark.table("psi_alert")
        .as[(Long, Long, Double, Boolean)].collect()
        .filter(_._1 < (t0 + 3000000L) * 1000L).sortBy(_._1)
      assert(rows.length === 2)
      val Array(spread, collapsed) = rows
      assert(!spread._4 && spread._3 < 0.1,
        s"the decile-matched window must stay quiet, psi ${spread._3}")
      assert(collapsed._4 && collapsed._3 > 0.25,
        s"the collapsed window must alarm, psi ${collapsed._3}")
    } finally q.stop()
  }

  test("degenerate references refuse loudly") {
    val df = Seq(obs(0, 500L)).toDF("ts", "p4")
    intercept[IllegalArgumentException] {
      Pipeline.psiMonitor(df, Seq.fill(9)(0.1), "1 hour", "1 minute", 0.25)
    }
    intercept[IllegalArgumentException] {
      Pipeline.psiMonitor(df, Seq(0.0) ++ Seq.fill(8)(0.1) :+ 0.2,
        "1 hour", "1 minute", 0.25)
    }
    intercept[IllegalArgumentException] {
      Pipeline.psiMonitor(df, Seq.fill(10)(0.2), "1 hour", "1 minute", 0.25)
    }
  }
}
