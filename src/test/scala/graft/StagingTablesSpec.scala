package graft

import org.apache.spark.sql.functions._
import graft.sources.StagingTables

/** The bucketing contract at the plan level: two tables bucketed on
  * the same key join WITHOUT any exchange — the property that turns a
  * repeated 100 TB shuffle into a one-time staging write. */
class StagingTablesSpec extends SparkSpec {
  import spark.implicits._

  test("a sort-merge join of co-bucketed tables plans with zero shuffles") {
    val events = (1L to 1000L).map(i => (i, i % 50, s"e$i")).toDF("event_id", "user_id", "payload")
    val profile = (0L until 50L).map(i => (i, s"tier-${i % 3}")).toDF("user_id", "tier")
    StagingTables.writeBucketed(events, "stg_events", "user_id", 8)
    StagingTables.writeBucketed(profile, "stg_profile", "user_id", 8)
    // disable auto-broadcast so the plan must rely on bucketing (a
    // broadcast would hide whether bucketing removed the shuffle)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = StagingTables.read(spark, "stg_events")
        .join(StagingTables.read(spark, "stg_profile"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 1000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("initPartitionedIfAbsent migrates a pre-partitioned-layout table, preserving rows") {
    // a table written by the OLD append-mode compactor: 4 columns, no
    // batch_id partition — a restart under the new layout must not
    // die on the positional insert, and must not erase survived rows
    StagingTables.writeSmall(
      Seq(("view", 9L, 3L, 900L), ("click", 10L, 1L, 1000L))
        .toDF("event_type", "day", "n_day", "last_us"), "stg_migrate")
    val withPart = Seq.empty[(String, Long, Long, Long)]
      .toDF("event_type", "day", "n_day", "last_us")
      .withColumn("batch_id", lit(0L))
    StagingTables.initPartitionedIfAbsent(withPart, "stg_migrate", "batch_id")
    val rows = spark.table("stg_migrate")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(rows === Set(("view", 9L, 3L, 900L, -1L), ("click", 10L, 1L, 1000L, -1L)),
      s"migration must land survived rows in the batch_id=-1 sentinel partition: $rows")
    // and the new layout's positional insert now works
    graft.streaming.Pipeline.compactBatch(
      Seq(("purchase", 11L, 2L, 1100L)).toDF("event_type", "day", "n_day", "last_us"),
      "stg_migrate", 7L)
    val after = graft.streaming.Pipeline
      .freshnessDayHistory(spark, "stg_migrate")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(after === Set(("view", 9L, 3L, 900L), ("click", 10L, 1L, 1000L),
      ("purchase", 11L, 2L, 1100L)))
    // idempotent: a second init over the migrated table is a no-op
    StagingTables.initPartitionedIfAbsent(withPart, "stg_migrate", "batch_id")
    assert(spark.table("stg_migrate").count() === 3L)
  }

  test("aggregation on the bucket key also avoids the shuffle") {
    // self-contained: writes its own table so the test runs alone
    val events = (1L to 500L).map(i => (i, i % 50)).toDF("event_id", "user_id")
    StagingTables.writeBucketed(events, "stg_agg", "user_id", 8)
    val counts = StagingTables.read(spark, "stg_agg")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val plan = counts.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg must not shuffle:\n$plan")
    assert(counts.count() === 50L)
  }
}
