package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.TextOps

/** Pins for the BPE encode family: greedy-merge semantics on picked
  * tokens, the concat/length round-trip laws, agreement with an
  * in-memory reference implementation on random inputs, and the
  * engine-side consistency between t_bpe_encode and the merge table it
  * was trained on. The oracle (recursive CTE + list_reduce) is the
  * cross-engine check; these are the algebraic ones. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy BPE: scan left-to-right per rank-ordered merge;
    * plain Scala, no folds — structurally independent of the engine's
    * nested-fold expression AND of the oracle's list_reduce. */
  private def refSegment(tok: String, merges: Seq[String]): Seq[String] =
    merges.foldLeft(tok.map(_.toString).toList) { (syms, m) =>
      val (c1, c2) = (m.substring(0, 1), m.substring(1, 2))
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == c1 && syms(i + 1) == c2) {
          out += m; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }

  private def segment(toks: Seq[String], merges: Seq[String]): Map[String, Seq[String]] =
    toks.toDF("tok")
      .select(col("tok"), TextOps.bpeSegment(col("tok"), merges).as("subs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap

  test("greedy merge semantics on picked tokens") {
    val merges = Seq("th", "he", "aa", "ab", "ll")
    val got = segment(Seq("the", "aaa", "abab", "hello", "t", "aab"), merges)
    // 'th' outranks 'he': the h is consumed left-to-right
    assert(got("the") === Seq("th", "e"))
    // overlapping run merges leftmost-first, non-overlapping
    assert(got("aaa") === Seq("aa", "a"))
    // adjacent occurrences both merge (the shared-boundary case a
    // separator-string replace() formulation gets wrong)
    assert(got("abab") === Seq("ab", "ab"))
    // second-rank merge applies after the first; fused "he" blocks
    // nothing for 'll'
    assert(got("hello") === Seq("he", "ll", "o"))
    // single char: no pairs
    assert(got("t") === Seq("t"))
    // 'aa' (rank 3) beats 'ab' (rank 4): after aa fuses, the b cannot
    // pair with a fused 2-char symbol
    assert(got("aab") === Seq("aa", "b"))
  }

  test("round-trip laws on the real corpus vocabulary") {
    val docs = SparkEntry.T(spark, "/root/testdata/sf0.001", "documents")
    val merges = TextOps.bpeMerges(docs, 20)
    assert(merges.nonEmpty && merges.forall(_.length == 2))
    val enc = TextOps.bpeVocabEncoded(docs, merges)
    // concat of subwords reassembles the token, every subword is
    // non-empty, and the count column matches the array
    val bad = enc.filter(
      concat_ws("", col("subs")) =!= col("tok") ||
      size(filter(col("subs"), s => length(s) === 0)) > 0 ||
      col("n_sub") =!= size(col("subs"))).count()
    assert(bad === 0L)
    // every fused subword (len >= 2) must start with a learned pair —
    // with one-round char merges, fused symbols ARE merge pairs
    val fused = enc.select(explode(col("subs")).as("s")).filter(length(col("s")) >= 2)
      .filter(!col("s").isin(merges.map(_.asInstanceOf[Any]): _*)).count()
    assert(fused === 0L)
  }

  test("engine segmentation agrees with the reference on random tokens and merge tables") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val alpha = Gen.oneOf('a', 'b', 'c', 'd')
    val tokGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    val mergeGen = for {
      k <- Gen.choose(0, 6)
      ps <- Gen.listOfN(k, Gen.zip(alpha, alpha).map { case (a, b) => s"$a$b" })
    } yield ps.distinct
    val caseGen = Gen.zip(Gen.nonEmptyListOf(tokGen), mergeGen)
    val r = SCTest.check(params, Prop.forAll(caseGen) { case (toks, merges) =>
      val got = segment(toks.distinct, merges)
      toks.distinct.forall(t => got(t) == refSegment(t, merges))
    })
    assert(r.passed, s"bpe vs reference: ${r.status}")
  }

  test("t_bpe_encode totals are consistent with t_bpe_merges' corpus and the regex proxy is an over-segmentation") {
    val dir = "/root/testdata/sf0.001"
    val enc = SparkEntry.queries("t_bpe_encode")(spark, dir)
    val row = enc.agg(sum("n_tok"), sum("n_chars"), sum("n_sub")).head()
    val (nTok, nChars, nSub) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // merges strictly compress: tokens <= subwords <= chars, and at
    // least one merge actually fired on this corpus
    assert(nTok <= nSub && nSub < nChars)
    // packing on encoded counts lays out exactly sum(n_sub) positions
    val pack = SparkEntry.queries("t_pack_bpe")(spark, dir)
    val last = pack.agg(max(col("tok_start") + col("n_tok"))).head().getLong(0)
    assert(last === nSub)
  }
}
