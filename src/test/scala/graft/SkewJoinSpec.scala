package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the unsalted join's rows") {
    // skewed left: one hot key with most rows
    val left = ((1 to 90).map(i => (i.toLong, 1L)) ++ Seq((91L, 2L), (92L, 3L)))
      .toDF("row_id", "k")
    val right = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"), (4L, "unmatched"))
      .toDF("k", "label")
    val plain = left.join(right, "k").select("row_id", "label")
      .as[(Long, String)].collect().sorted.toSeq
    val salted = SkewJoin.salted(left, right, "k", 8, col("row_id"))
      .select("row_id", "label").as[(Long, String)].collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.count(_._2 == "hot") === 90)
  }

  test("the hot key's rows actually spread across salt buckets") {
    val left = (1 to 64).map(i => (i.toLong, 1L)).toDF("row_id", "k")
    val salts = left.withColumn("_salt",
        pmod(graft.codec.Codecs.portableHash(col("row_id")), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts > 4, "salt hash should hit most of the 8 buckets")
  }
}
