package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.functions.PqEncode

/** The native codegen'd PQ encode must be indistinguishable from the
  * composed nested-HOF fold it replaced — same argmin, same strict-less
  * tie rule, same null/NaN skipping — since the s_ann_pq oracles were
  * written against the composed semantics. Shared session has codegen
  * fallback disabled, so doGenCode bugs fail loudly; the literal-input
  * case is constant-folded, exercising the interpreted eval() too. */
class PqEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8
  private val SUB = 8
  private val K = 4

  private def seedsOf(emb: org.apache.spark.sql.DataFrame) =
    emb.filter(col("vec_id") < K)
      .agg(sort_array(collect_list(struct(col("vec_id"), col("v")))).as("ss"))
      .select(transform(col("ss"), s => s.getField("v")).as("seeds"))

  test("native PQ encode matches the composed HOF fold on the fixture corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("v", Similarity.asDouble(col("embedding")))
    val framed = emb.crossJoin(broadcast(seedsOf(emb)))
    val diff = framed.select(
        PqEncode.pqEncode(col("v"), col("seeds"), M, SUB, K).as("fast"),
        Similarity.pqCodesComposed(M, SUB, K).as("slow"))
      .filter(!(col("fast") === col("slow")))
      .count()
    assert(diff === 0L, "native and composed PQ codes must agree exactly")
  }

  test("a seed vector encodes to its own code in every subspace") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("v", Similarity.asDouble(col("embedding")))
    val self = emb.filter(col("vec_id") < K).crossJoin(broadcast(seedsOf(emb)))
      .select(col("vec_id"),
        PqEncode.pqEncode(col("v"), col("seeds"), M, SUB, K).as("codes"))
      .withColumn("rank_of_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))) - 1)
    // seed c's every subspace distance to codeword c is exactly 0, and
    // strict-less keeps the first zero hit — which is c itself unless an
    // earlier seed ties at 0 (not the case in the fixture corpus)
    val bad = self
      .filter(exists(col("codes"), c => c =!= col("rank_of_id")))
      .count()
    assert(bad === 0L)
  }

  test("edge cases: null vec, tie keeps smallest code, clipped-length mismatch skips") {
    // m=2, sub=2, k=3 over 4-dim vectors
    val enc = (v: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) =>
      PqEncode.pqEncode(v, s, 2, 2, 3)
    val seeds = typedLit(Seq(
      Seq(0.0, 0.0, 0.0, 0.0),
      Seq(0.0, 0.0, 0.0, 0.0),   // exact tie with seed 0 → code 0 wins
      Seq(9.0, 9.0)))            // clipped in subspace 2 → skipped there
    val rows = Seq(
      (1L, Some(Seq(0.1, 0.0, 9.0, 9.0))),  // sub1 → 0 (tie), sub2 → cw2 matches but clipped? no: cw2 covers dims 1-2 only
      (2L, None)                             // null vec → code 0 everywhere
    ).toDF("id", "v0")
    val got = rows.select(col("id"),
        enc(col("v0").cast("array<double>"), seeds).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    // row 1: subspace 1 — seeds 0/1 tie at d=0.01, seed 2 d=(9-0.1)²+81 → code 0;
    //        subspace 2 — seeds 0/1 d=162 tie, seed 2 clipped (len 0 vs 2) skipped → code 0
    assert(got(1L) === Seq(0, 0))
    assert(got(2L) === Seq(0, 0))

    // composed twin agrees on the same frame (minus the null row: the
    // HOF's ANSI element_at path is only defined for full-length seeds)
    val framed = rows.filter(col("id") === 1L)
      .select(col("v0").cast("array<double>").as("v"))
      .withColumn("seeds", typedLit(Seq(
        Seq(0.0, 0.0, 0.0, 0.0), Seq(0.0, 0.0, 0.0, 0.0), Seq(9.0, 9.0, 9.0, 9.0))))
    val agree = framed.select(
        enc(col("v"), col("seeds")).as("fast"),
        Similarity.pqCodesComposed(2, 2, 3).as("slow"))
      .filter(!(col("fast") === col("slow"))).count()
    assert(agree === 0L)
  }

  test("NaN distances never replace the incumbent (oracle's NaN-last rule)") {
    val seeds = typedLit(Seq(Seq(Double.NaN, 0.0), Seq(1.0, 1.0)))
    val got = spark.range(1).select(
        PqEncode.pqEncode(typedLit(Seq(1.0, 1.0)), seeds, 1, 2, 2).as("codes"))
      .as[Seq[Int]].head()
    // seed 0's distance is NaN (never < MaxValue) → seed 1 (d=0) wins
    assert(got === Seq(1))
  }
}
