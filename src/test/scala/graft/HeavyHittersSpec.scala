package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.functions.MisraGries
import graft.functions.MisraGries.{MGAgg, MGSummary}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("Misra–Gries retains every item above N/(m+1) under eviction") {
    val agg = new MGAgg(2)
    // 5×a interleaved with 5 singletons: N=10, threshold 10/3 — 'a'
    // must survive although the 2-counter summary evicts constantly
    val stream = Seq("a", "x1", "a", "x2", "a", "x3", "a", "x4", "a", "x5")
    val s = stream.foldLeft(agg.zero)(agg.reduce)
    assert(s.n === 10L)
    assert(s.items.size <= 2)
    assert(s.items.contains("a"))
    // estimate error bound: true 5, underestimate by at most N/(m+1)
    assert(s.items("a") >= 5L - 10L / 3L)
  }

  test("Misra–Gries merge keeps the bound and the capacity") {
    val agg = new MGAgg(2)
    val left = Seq("a", "a", "a", "b", "c").foldLeft(agg.zero)(agg.reduce)
    val right = Seq("a", "a", "d", "d", "e").foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(left, right)
    assert(merged.n === 10L)
    assert(merged.items.size <= 2)
    assert(merged.items.contains("a")) // true freq 5 > 10/3
    // merging with an empty summary is the identity
    val same = agg.merge(merged, agg.zero)
    assert(same === merged)
  }

  test("two-phase exact heavy hitters equal the sketch-free aggregate") {
    // skewed corpus: 'hot hot' bigram repeats far above threshold,
    // with enough distinct filler bigrams that m=4 must evict
    val docs = Seq(
      (1L, "hot hot hot hot hot hot hot hot"),
      (2L, "hot hot hot hot a b c d e f"),
      (3L, "g h i j k l m n o p q r")).toDF("doc_id", "text")
    val m = 4
    val got = TextOps.heavyHitters(docs, m)
      .as[(String, Long)].collect().toSet
    val occ = docs.select(explode(graft.codec.Codecs.shingles(
      graft.codec.Codecs.tokens(col("text")), 2)).as("s"))
    val n = occ.count()
    val exp = occ.groupBy("s").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (m + 1) > lit(n))
      .as[(String, Long)].collect().toSet
    assert(got === exp)
    assert(got.exists(_._1 == "hot hot")) // the planted heavy hitter
  }

  test("phase 2 erases surplus candidates: output is threshold-exact") {
    // 8 distinct bigrams, m=3: the sketch necessarily retains ≤ 3
    // arbitrary survivors, but none clears cnt·4 > 8 — phase 2 must
    // filter every one of them out
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    assert(TextOps.heavyHitters(docs, 3).count() === 0L)
  }
}
