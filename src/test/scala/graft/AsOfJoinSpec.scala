package graft

import java.sql.Timestamp
import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

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
