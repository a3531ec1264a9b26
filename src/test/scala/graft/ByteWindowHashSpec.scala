package graft

import org.apache.spark.sql.functions._
import graft.codec.Codecs
import graft.functions.ByteWindowHash.byteWindowHash

/** Pins for the fused byte-window hash expression: it must be
  * bit-for-bit the composed hex().substr().portableHash form it
  * replaced — that composition is what the DuckDB oracle still
  * recomputes for m_media_neardup. */
class ByteWindowHashSpec extends SparkSpec {

  test("matches the composed hex/substr/portableHash form on arbitrary payloads") {
    import spark.implicits._
    // payloads exercising every byte value, short tails, and repeats
    val payloads = Seq(
      Array.tabulate(256)(_.toByte),
      "hello world, hello world".getBytes("UTF-8"),
      Array[Byte](0, 0, 0, 0, 0),
      Array[Byte](-1, -128, 127, 1, 2, 3),
      Array.tabulate(64)(i => (i * 37 + 11).toByte))
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("doc_id", "payload")
    val fused = df.select(col("doc_id"),
        posexplode(byteWindowHash(col("payload"), 4)).as(Seq("i", "h")))
    val composed = df.select(col("doc_id"), hex(col("payload")).as("hx"),
        length(col("payload")).as("n"))
      .filter(col("n") >= 4)
      .select(col("doc_id"), col("hx"),
        explode(sequence(lit(0), col("n") - 4)).as("i"))
      .select(col("doc_id"), col("i"),
        Codecs.portableHash(col("hx").substr(col("i") * 2 + 1, lit(8))).as("h"))
    val a = fused.orderBy("doc_id", "i").as[(Long, Int, Long)].collect().toSeq
    val b = composed.orderBy("doc_id", "i").as[(Long, Int, Long)].collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  test("short payloads yield an empty array; null payload yields null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array[Byte](1, 2, 3))),
      (2L, Some(Array[Byte](1, 2, 3, 4))),
      (3L, Option.empty[Array[Byte]])).toDF("doc_id", "payload")
    val got = df.select(col("doc_id"),
        byteWindowHash(col("payload"), 4).as("hs"))
      .orderBy("doc_id")
      .collect()
    assert(got(0).getSeq[Long](1).isEmpty, "3-byte payload has no 4-byte window")
    assert(got(1).getSeq[Long](1).length === 1)
    assert(got(2).isNullAt(1), "null payload must stay null")
  }
}
