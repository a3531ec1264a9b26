package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Behavioral pins for ranked retrieval and collocations: BM25 must
  * rank by term frequency with length normalization, PMI must rank
  * always-together pairs above independent ones. Fixtures are built
  * so the derived query/bigram sets are unambiguous. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  /** 30 filler docs pin the df ranking (tokens f0.. are the head the
    * query derivation must skip); three probe docs share the tail
    * terms with different tf and length. */
  private def corpus: Seq[(Long, String)] = {
    // 11 distinct filler tokens, each in a distinct subset of docs so
    // df ranks 1..11 are the fillers; then 3 probe terms with df 3
    // 60 filler docs: df(f_k) = 60/(k+1) >= 6, strictly above the
    // probe terms' df of 3, so the df ranking is fillers 1..11 then
    // (alphabetically within the df=3 tie) alpha, beta, gamma
    val fillers = (0 until 60).map { i =>
      (i.toLong, (0 to 10).filter(k => i % (k + 1) == 0).map(k => s"f$k").mkString(" "))
    }
    // equal-length pair isolates tf (100 vs 101); equal-tf pair
    // isolates length normalization (100 vs 102)
    val probes = Seq(
      (100L, "alpha pad pad beta gamma"),
      (101L, "alpha alpha alpha beta gamma"),
      (102L, "alpha beta gamma"))
    fillers ++ probes
  }

  test("bm25: higher tf wins; shorter doc wins at equal tf") {
    val docs = corpus.toDF("doc_id", "text")
    // df ranking: f0 (30 docs) .. f10, then pad(1)/alpha/beta/gamma(3)
    // — query = ranks 11..13 of (df DESC, tok): with 11 fillers ahead,
    // the window lands on the 3-df probe terms (alphabetical: alpha,
    // beta, gamma)
    val got = TextOps.bm25TopK(docs, 11, 3, 10)
      .select("doc_id", "score", "n_terms_hit")
      .as[(Long, Double, Long)].collect().toList
    val byDoc = got.map(r => r._1 -> r._2).toMap
    // all three probe docs appear and hit all 3 query terms
    assert(Set(100L, 101L, 102L).subsetOf(byDoc.keySet))
    got.filter(r => r._1 >= 100L).foreach(r =>
      assert(r._3 === 3L, s"doc ${r._1} must match all 3 query terms"))
    assert(byDoc(101L) > byDoc(100L), "tf=3 on alpha must outscore tf=1 at equal length")
    assert(byDoc(102L) > byDoc(100L), "shorter doc must outscore padded doc at equal tf")
  }

  test("mmr: the second pick skips the near-duplicate of the first for coverage") {
    // vec 0 = query; 1 ≈ 2 (near-duplicates, both most relevant);
    // 3 is less relevant but diverse — plain top-2 would return
    // (1, 2); MMR must return (1, 3)
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.43589f, 0.0f, 0.0f), 0),
      (2L, Seq(0.895f, 0.44617f, 0.0f, 0.0f), 0),
      (3L, Seq(0.85f, 0.0f, 0.5268f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = graft.ext.Similarity.mmrRerank(emb, 0L, 3, 2, 0.7, 0.3)
      .select("rank", "vec_id").as[(Int, Long)].collect().toList
    assert(got.map(_._2) === List(1L, 3L), s"got $got")
  }

  test("pmi: an always-together pair outranks a frequent independent pair") {
    // "zig zag" always adjacent (20 docs); "foo"/"bar" both frequent
    // but adjacent in only a few docs
    val docs = ((0 until 20).map(i => (i.toLong, "zig zag end")) ++
      (0 until 20).map(i => (100L + i, if (i < 5) "foo bar mid" else "foo mid bar")))
      .toDF("doc_id", "text")
    val got = TextOps.pmiTopK(docs, 5L, 10)
      .select("bigram", "pmi").as[(String, Double)].collect().toList
    val pm = got.toMap
    assert(pm.contains("zig zag"))
    assert(pm.contains("foo bar"))
    assert(pm("zig zag") > pm("foo bar"),
      s"always-adjacent must outrank independent: $got")
  }
}
