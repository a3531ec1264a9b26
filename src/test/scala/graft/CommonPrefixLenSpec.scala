package graft

import org.apache.spark.sql.functions._
import graft.functions.CommonPrefixLen.commonPrefixLen

/** Pins for the native code-point LCP: exact agreement with the
  * composed per-code-point form the char-level suffix tail used to
  * run (split("") → zip_with equality → array_position), which is
  * also what the DuckDB oracle recomputes for the substring family. */
class CommonPrefixLenSpec extends SparkSpec {

  /** The composed LCP the native expression replaces: per-code-point
    * split arrays, null-padded zip, first mismatch. */
  private def composedLcp(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ca = filter(split(a, ""), ch => length(ch) > 0)
    val cb = filter(split(b, ""), ch => length(ch) > 0)
    val z = zip_with(ca, cb, (x, y) =>
      when(x.isNull || y.isNull, lit(false)).otherwise(x === y))
    val p = array_position(z, lit(false))
    when(p === 0L, least(size(ca), size(cb)).cast("long")).otherwise(p - 1L)
  }

  test("matches the composed split+zip_with LCP on ascii, multibyte and supplementary pairs") {
    import spark.implicits._
    val pairs = Seq(
      ("the quick brown fox", "the quick brown cat"),
      ("identical", "identical"),
      ("prefix", "prefixandmore"),
      ("", "anything"),
      ("", ""),
      ("no overlap", "zero"),
      ("café au lait", "café crème"),        // mismatch after 2-byte seqs
      ("café", "cafe"),                  // 2-byte vs ascii at the boundary
      ("中文测试文本", "中文测验文本"),          // 3-byte seqs, interior mismatch
      ("a😀b😁c", "a😀b😂c"),                  // 4-byte seqs, interior mismatch
      ("😀😁", "😀"),                          // supplementary prefix
      ("tab\tand space", "tab\tand  space"))
    val df = pairs.toDF("a", "b")
    val got = df.select(commonPrefixLen(col("a"), col("b"))).as[Long].collect()
    val want = df.select(composedLcp(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq === want.toSeq)
    // symmetry
    val rev = df.select(commonPrefixLen(col("b"), col("a"))).as[Long].collect()
    assert(rev.toSeq === want.toSeq)
  }

  test("random pair sweep agrees with the composed form") {
    import spark.implicits._
    val alphabet = "abé漢😀 \t"
    val rnd = new scala.util.Random(42)
    def s(): String = {
      val cps = alphabet.codePoints().toArray
      (0 until rnd.nextInt(12)).map(_ =>
        new String(Character.toChars(cps(rnd.nextInt(cps.length))))).mkString
    }
    val pairs = (1 to 300).map { _ =>
      val base = s()
      if (rnd.nextBoolean()) (base + s(), base + s()) else (s(), s())
    }
    val df = pairs.toDF("a", "b")
    val got = df.select(commonPrefixLen(col("a"), col("b"))).as[Long].collect()
    val want = df.select(composedLcp(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("null on either side is null") {
    import spark.implicits._
    val df = Seq((Some("a"), Option.empty[String]),
      (Option.empty[String], Some("b")),
      (Some("ab"), Some("ac"))).toDF("a", "b")
    val got = df.select(commonPrefixLen(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0) && got(2).getLong(0) === 1L)
  }

  test("char-level suffix tail is value-identical to the array composition") {
    import spark.implicits._
    // a corpus with cross-doc repeats at mid-word, multibyte and
    // supplementary positions — run the public API and recompute the
    // per-position expectation over split arrays in memory
    val docs = Seq(
      (1L, "the shared boilerplate footer appears here word"),
      (2L, "intro text then the shared boilerplate footer appears here"),
      (3L, "caféabcdefghij unrelated 漢字漢字漢字漢字"),
      (4L, "xxcaféabcdefghij tail and 漢字漢字漢字漢字 again"),
      (5L, "totally unique content with no repeats at all")
    ).toDF("doc_id", "text")
    val n = 8; val maxLcp = 20
    val got = graft.ext.Dedup.substringMatchesChar(docs, n, maxLcp)
      .orderBy("doc_id", "pos")
      .as[(Long, Long, Long, String)].collect().toSeq
    // in-memory oracle: capped suffixes at every cross-doc-duplicated
    // gram position, nearest-other LCP via full pairwise max (valid
    // upper bound check: pairwise max == suffix-order nearest max)
    val texts = docs.as[(Long, String)].collect().toMap
      .map { case (k, v) => k -> v.toLowerCase.trim.codePoints().toArray }
    def gram(d: Long, p: Int) = texts(d).slice(p, p + n).mkString(",")
    val allPos = for {
      (d, cps) <- texts.toSeq; p <- 0 to cps.length - n
    } yield (d, p)
    val byGram = allPos.groupBy { case (d, p) => gram(d, p) }
    val want = (for {
      (_, ps) <- byGram.toSeq
      if ps.map(_._1).distinct.size >= 2
      (d, p) <- ps
    } yield {
      val sfx = texts(d).slice(p, p + maxLcp)
      val best = ps.filter(_._1 != d).map { case (od, op) =>
        val osfx = texts(od).slice(op, op + maxLcp)
        sfx.zip(osfx).takeWhile { case (x, y) => x == y }.length.toLong
      }.max
      (d, p.toLong, best, sfx.take(best.toInt).map(cp =>
        new String(Character.toChars(cp))).mkString)
    }).filter(_._3 >= n)
      .sortBy(t => (t._1, t._2))
    assert(got === want)
  }
}
