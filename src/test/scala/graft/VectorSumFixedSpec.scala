package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.functions.VectorSumFixed

/** The imperative fixed-point vector sum must be indistinguishable
  * from the composed per-dimension `sum(round(v[i]*scale))` form — the
  * k-means oracle SQL was written against the composed semantics, and
  * the codebook it feeds must stay bit-identical. */
class VectorSumFixedSpec extends SparkSpec {
  import spark.implicits._

  test("imperative sum equals the composed per-dim round+sum on the fixture corpus") {
    val dims = 64
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("v", Similarity.asDouble(col("embedding")))
    val composed = (1 to dims).map(i =>
      sum(round(element_at(col("v"), i) * Similarity.KmeansScale).cast("long")))
    val rows = emb.groupBy("label")
      .agg(VectorSumFixed.vecSumFixed(col("v"), dims, Similarity.KmeansScale).as("fast"),
        array(composed: _*).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(rows === 0L)
  }

  test("rounding ties break HALF_UP exactly like Spark round(), both signs") {
    // ±0.5 micro-units: HALF_UP rounds away from zero; a HALF_EVEN
    // implementation (math.rint) would round both to 0 and diverge
    val v = Seq((1L, Array(0.0000005d, -0.0000005d, 0.0000015d, -0.0000025d)))
      .toDF("id", "v")
    val got = v.groupBy("id")
      .agg(VectorSumFixed.vecSumFixed(col("v"), 4, Similarity.KmeansScale).as("s"))
      .select(col("s")).as[Seq[Long]].head()
    val composed = v.groupBy("id")
      .agg(array((1 to 4).map(i =>
        sum(round(element_at(col("v"), i) * Similarity.KmeansScale).cast("long"))): _*).as("s"))
      .select(col("s")).as[Seq[Long]].head()
    assert(got === composed)
    // the ties must actually round away from zero somewhere: a
    // HALF_EVEN drift would show as a zero where composed has ±1
    assert(got.exists(_ != 0L))
  }

  test("k-means codebook is bit-identical through the imperative mean path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fast = Similarity.kmeansCodebook(emb, 8, 64, 2).collect().toSeq
    val slow = Similarity.kmeansCodebookComposed(emb, 8, 64, 2).collect().toSeq
    assert(fast === slow)
  }
}
