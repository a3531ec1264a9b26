package graft

import org.apache.spark.sql.functions._
import graft.codec.Codecs
import graft.functions.CharWindowHash.charWindowHash

/** Pins for the fused char-window hash: bit-for-bit the composed
  * substr+portableHash form — that composition is what the DuckDB
  * oracle recomputes for the whole char-level substring family. */
class CharWindowHashSpec extends SparkSpec {

  test("matches substr+portableHash on ascii, multibyte and supplementary inputs") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over it",
      "tabs\tand  double  spaces inside",
      "café naïve résumé — dash",   // 2-byte seqs
      "中文测试文本中文", // 3-byte seqs
      "emoji 😀😁 mix a😂b more", // 4-byte seqs
      "short")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "txt")
    for (n <- Seq(3, 5)) {
      val fused = df.select(col("doc_id"),
          posexplode(charWindowHash(col("txt"), n)).as(Seq("pos", "h")))
        .as[(Long, Int, Long)].collect().toSeq.sorted
      val composed = df
        .filter(length(col("txt")) >= n)
        .select(col("doc_id"), col("txt"),
          explode(sequence(lit(0), length(col("txt")) - n)).as("pos"))
        .select(col("doc_id"), col("pos"),
          Codecs.portableHash(col("txt").substr(col("pos") + 1, lit(n))).as("h"))
        .as[(Long, Int, Long)].collect().toSeq.sorted
      assert(fused.nonEmpty && fused === composed, s"divergence at n=$n")
    }
  }

  test("short and null strings behave like the composed form") {
    import spark.implicits._
    val df = Seq((1L, Some("ab")), (2L, Some("abc")), (3L, Option.empty[String]))
      .toDF("doc_id", "txt")
    val got = df.select(col("doc_id"), charWindowHash(col("txt"), 3).as("hs"))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[Long](1).isEmpty, "2 chars have no 3-char window")
    assert(got(1).getSeq[Long](1).length === 1)
    assert(got(2).isNullAt(1), "null stays null")
  }
}
