package graft

import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix56.md5Prefix56

/** Pins for the native 56-bit md5 prefix: bit-for-bit the composed
  * conv(substr(md5(x),1,14),16,10) chain — that composition is what
  * the DuckDB oracle recomputes wherever Spark-side hashing must be
  * externally checkable ([[graft.codec.Codecs.portableHash]]). The
  * raw chain is spelled out here (not via Codecs) so this spec keeps
  * pinning the CONTRACT even though portableHash itself now routes
  * through the native expression. */
class Md5Prefix56Spec extends SparkSpec {

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 14), 16, 10)
      .cast("long")

  test("matches the conv chain on strings: ascii, unicode, empty, long") {
    import spark.implicits._
    val df = Seq(
      "a", "", "the quick brown fox", "café — naïve 😀 中文",
      "0", "-17", "#seed#42", "x" * 5000).toDF("s")
    val rows = df.select(
        md5Prefix56(col("s").cast("string").cast("binary")).as("fused"),
        composed(col("s")).as("chain"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (f, c) => f == c })
  }

  test("matches the conv chain on cast-rendered numerics and nulls") {
    import spark.implicits._
    val df = Seq(Some(0L), Some(42L), Some(-7L), Some(Long.MaxValue), None)
      .toDF("v")
    val rows = df.select(
        md5Prefix56(col("v").cast("string").cast("binary")).as("fused"),
        composed(col("v")).as("chain"))
      .as[(Option[Long], Option[Long])].collect()
    assert(rows.forall { case (f, c) => f == c })
    assert(rows.count(_._1.isEmpty) == 1) // null in → null out, like the chain
  }

  test("value is always non-negative and below 2^56") {
    import spark.implicits._
    val rows = spark.range(2000)
      .select(md5Prefix56(col("id").cast("string").cast("binary")).as("h"))
      .as[Long].collect()
    assert(rows.forall(h => h >= 0L && h < (1L << 56)))
  }
}
