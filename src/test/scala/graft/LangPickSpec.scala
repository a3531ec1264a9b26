package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.codec.Codecs.tokens
import graft.ext.TextOps

/** Pins for the native one-pass language pick: row-identical to the
  * composed 4×filter(isin) + when-chain it replaced (the form the
  * DuckDB oracle still replays in SQL). The composed chain is spelled
  * out HERE so the contract stays pinned even though TextOps.langId
  * now routes through the native expression. */
class LangPickSpec extends SparkSpec {

  /** The pre-r15 composed form, verbatim. */
  private def composed(text: Column): Column = {
    def hits(toks: Column, words: Seq[String]): Column =
      size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))
    val toks = tokens(text)
    val en = hits(toks, TextOps.stop("en")); val es = hits(toks, TextOps.stop("es"))
    val de = hits(toks, TextOps.stop("de")); val fr = hits(toks, TextOps.stop("fr"))
    val zh = regexp_count(text, lit("[\\u4e00-\\u9fff]"))
    when(zh > 0, "zh")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  test("matches the composed chain on crafted edge cases") {
    import spark.implicits._
    val df = Seq(
      Some("the cat and the dog of a house"),        // en
      Some("el la de que y los es"),                 // es
      Some("der die und das ist nicht"),             // de
      Some("le les et des un une est"),              // fr
      Some("你好 the and of"),                        // zh beats stopwords
      Some(""),                                      // all counts 0 -> en
      Some("   "),                                   // whitespace only -> en
      Some("zzz qqq www"),                           // no hits -> en (ties)
      Some("de de de le le le"),                     // es vs fr tie rules
      Some("LE LES ET DES UN UNE EST"),              // lowercasing
      Some("des de"),                                // one es + one fr hit
      None)                                          // null text -> fr
      .toDF("text")
    val rows = df.select(
        TextOps.langId(col("text")).as("native"),
        composed(col("text")).as("chain"))
      .as[(String, String)].collect()
    assert(rows.nonEmpty && rows.forall { case (n, c) => n == c },
      rows.mkString(", "))
  }

  test("matches the composed chain on the whole fixture corpus") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(
        TextOps.langId(col("text")).as("native"),
        composed(col("text")).as("chain"))
      .filter(col("native") =!= col("chain") ||
        col("native").isNull || col("chain").isNull)
      .count()
    assert(bad == 0)
  }
}
