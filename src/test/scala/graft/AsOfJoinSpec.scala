package graft

import java.sql.Timestamp
import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("a null field in the matching right row is NOT backfilled from older rows") {
    val left = Seq((1L, 10L, ts(300))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts(100), Some("early")),
      (101L, 10L, ts(200), None: Option[String])) // the match, with a null field
      .toDF("event_id", "user_id", "ts", "note")
    val got = AsOfJoin.asofJoin(left, right, "user_id", "ts",
        Seq("event_id", "note"), "event_id")
      .select($"asof_event_id".as[Long], $"asof_note".as[Option[String]]).head()
    assert(got === ((101L, None)), "fields must come from ONE right row, atomically")
  }

  test("asof picks the latest right row at-or-before each left row") {
    val left = Seq((1L, 10L, ts(100)), (2L, 10L, ts(250)), (3L, 20L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, ts(100)), (101L, 10L, ts(200)), (102L, 10L, ts(300)))
      .toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asofJoin(left, right, "user_id", "ts", Seq("event_id"), "event_id")
      .select($"event_id", $"asof_event_id".as[Option[Long]])
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      1L -> Some(100L), // equal time counts as at-or-before
      2L -> Some(101L), // latest of {100,200} <= 250
      3L -> None))      // other key: no right row at all
  }
}
