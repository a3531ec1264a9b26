package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a sign-bit LSH
  * bucketed variant as the scale path. Vector math is done with
  * higher-order functions (zip_with/aggregate) in double precision —
  * sequential left-to-right folds, so results are bit-deterministic and
  * oracle-reproducible. No UDFs.
  */
object Similarity {

  /** Double-precision view of a float vector. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** dot(a,b) via zip_with + an ordered fold (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Precompute per-vector norms once — at scale this is the cheap side
    * of the join and avoids recomputing norms per candidate pair. */
  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("v", asDouble(col("embedding")))
      .withColumn("nrm", norm(col("v")))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))

  /** Shared scoring/ranking tail of every ANN variant: broadcast the
    * query side, score candidates by cosine, rank with the ONE
    * tie-break rule (cos desc, vec_id) all variants share so their
    * outputs stay directly comparable. `cellCols` restricts candidates
    * to the query's cell (empty = exact search). */
  private def topK(queries: DataFrame, cands: DataFrame,
      cellCols: Seq[String], k: Int): DataFrame = {
    val cond = cellCols
      .map(c => col(s"q_$c") === col(c))
      .foldLeft(col("q_id") =!= col("vec_id"))(_ && _)
    broadcast(queries).join(cands, cond)
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("cos"), 4).as("cos"))
  }

  private def asQueries(vecs: DataFrame, queryPred: Column, cellCols: Seq[String]): DataFrame =
    vecs.filter(queryPred).select(
      Seq(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn")) ++
        cellCols.map(c => col(c).as(s"q_$c")): _*)

  /** Exact brute-force top-k cosine neighbors for a (small) query set.
    * The query side is broadcast; candidates stream by, so the work is
    * one pass over the corpus per batch of queries — the right baseline
    * shape even at 100 TB (queries × corpus scan, no shuffle of the
    * corpus). */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val vecs = withNorm(emb)
    topK(asQueries(vecs, queryPred, Nil), vecs.filter(!queryPred), Nil, k)
  }

  /** Sign-bit LSH bucket id from the first `nBits` dimensions
    * (axis-aligned random-hyperplane LSH; deterministic and
    * oracle-reproducible). Bucket join turns the quadratic candidate
    * term into per-bucket quadratic — the standard ANN scale path. */
  def lshBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(v, i + 1) > 0.0d, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: neighbors are only sought within the query's LSH
    * bucket. Recall < 1 by design; rank/tie rules identical to
    * brute-force so the two variants are directly comparable. */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int, nBits: Int): DataFrame = {
    val vecs = withNorm(emb).withColumn("bucket", lshBucket(col("v"), nBits))
    topK(asQueries(vecs, queryPred, Seq("bucket")),
      vecs.filter(!queryPred), Seq("bucket"), k)
  }

  /** IVF (inverted-file) ANN: every vector is assigned to its nearest
    * centroid cell; search touches only the query's cell. Centroids
    * are deterministically seeded (every `centroidEvery`-th vector) so
    * the oracle can reproduce the index — a k-means refinement would
    * drop in without changing any query shape. Assignment expands each
    * vector × n_centroids then reduces with a per-vector window; the
    * result is persisted via PlanCache since both sides of the search
    * join (queries and candidates) consume it. */
  def ivfAssign(emb: DataFrame, centroidEvery: Long): DataFrame =
    graft.ops.PlanCache.cachedBy(s"ivf-$centroidEvery",
        emb.queryExecution.logical.semanticHash(), emb.sparkSession) {
      val vecs = withNorm(emb)
      val cents = broadcast(vecs.filter(pmod(col("vec_id"), lit(centroidEvery)) === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn")))
      vecs.crossJoin(cents)
        .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("crnk", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_id"))))
        .filter(col("crnk") === 1)
        .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("c_id").as("cell"))
    }

  /** IVF top-k: neighbors sought within the query's centroid cell only
    * (nprobe=1; recall < 1 by design, rank rules identical to the
    * exact baseline for comparability). */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int, centroidEvery: Long): DataFrame = {
    val assigned = ivfAssign(emb, centroidEvery)
    topK(asQueries(assigned, queryPred, Seq("cell")),
      assigned.filter(!queryPred), Seq("cell"), k)
  }

  /** Embedding-cosine near-duplicate pairs (vec_a < vec_b, cos ≥ τ).
    * Local form is all-pairs; scale path buckets by [[lshBucket]] first
    * (see lshTopK) so only bucket-mates are compared. */
  def nearDupPairs(emb: DataFrame, minCos: Double): DataFrame = {
    val vecs = withNorm(emb)
    vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= minCos)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos"), 3).as("cos"))
  }
}
