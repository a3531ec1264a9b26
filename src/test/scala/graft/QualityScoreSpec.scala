package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.codec.Codecs.tokens
import graft.ext.TextOps

/** Pins for the native one-pass quality score: BIT-identical doubles
  * against the composed 2×tokens + filter(isin) + regexp chain it
  * replaced (one consumer rounds x·10000 to an integer, so round-4
  * closeness is not enough — the comparison below is on raw doubles).
  * The composed chain is spelled out here so the contract stays pinned
  * even though TextOps.qualityScore now routes through the native
  * expression. */
class QualityScoreSpec extends SparkSpec {

  /** The pre-r15 composed form, verbatim. */
  private def composed(text: Column): Column = {
    def hits(toks: Column, words: Seq[String]): Column =
      size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stopHits = hits(toks, TextOps.stop("en")).cast("double")
    val punct = regexp_count(text, lit("[.,!?;:]")).cast("double")
    val chars = length(text).cast("double")
    least(nTok / 50.0, lit(1.0)) * 0.5 +
      when(nTok > 0, stopHits / nTok).otherwise(0.0) * 0.3 +
      (lit(1.0) - least(when(chars > 0, punct / chars).otherwise(0.0), lit(1.0))) * 0.2
  }

  private def assertAgree(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.select(
        TextOps.qualityScore(col("text")).as("native"),
        composed(col("text")).as("chain"))
      .filter(col("native") =!= col("chain") ||
        col("native").isNull =!= col("chain").isNull)
      .count()
    assert(bad == 0)
  }

  test("bit-matches the composed chain on crafted edge cases") {
    import spark.implicits._
    val df = Seq(
      Some("the cat and the dog of a house, which is in a tree."),
      Some(""), Some("   "), Some("!!!???"),
      Some("no stopwords here whatsoever"),
      Some(("the and of to is in a " * 20).trim), // saturates length term
      Some("x.y,z!w?v;u:t"),
      None) // null text -> the 0.7 funnel
      .toDF("text")
    assertAgree(df)
    // the null funnel itself, explicitly
    import org.apache.spark.sql.Row
    val nullRow = df.filter(col("text").isNull)
      .select(TextOps.qualityScore(col("text")).as("q")).head()
    assert(nullRow.getDouble(0) == 0.7)
  }

  test("bit-matches the composed chain on the whole fixture corpus") {
    assertAgree(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
  }
}
