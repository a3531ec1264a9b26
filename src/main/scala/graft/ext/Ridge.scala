package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GramMatrixFixed, VectorSumFixed}

/** Ridge-regression linear probe over the embedding corpus — the
  * "train a quality/relevance head on frozen embeddings" step of an
  * LLM data pipeline, shaped like [[graft.SparkEntry.sEmbedPc1]]:
  *
  *  - The DISTRIBUTED part is one exact-moment aggregate pass: the
  *    fixed-point Gram matrix `G = XᵀX` ([[GramMatrixFixed]], d(d+1)/2
  *    longs) and the label moment `b = Xᵀy` ([[VectorSumFixed]] over
  *    the pre-multiplied `v·y` column, d longs) ride ONE partial-agg
  *    shuffle of ~d² longs per partition. A corpus of any size —
  *    100 TB included — reduces to the same d²-sized frame; no
  *    per-row data ever reaches the driver.
  *  - The DRIVER tail is a constant-size d×d iteration: `steps`
  *    damped-Jacobi sweeps on the normal equations
  *    `(G + λI) w = b`, from w₀ = 0, with the damping factor
  *    ω = 1 / max_i(Σ_j |A_ij| / A_ii) derived from the matrix
  *    itself. For SPD `A = G + λI` the eigenvalues of D⁻¹A are
  *    positive and Gershgorin-bounded by that max row ratio, so
  *    every eigen-component of the error contracts by a factor in
  *    [0, 1): the sweep never diverges, for any data. The iterate
  *    after a FIXED number of sweeps is the operator's contract
  *    (the bounded-step discipline of the PC1 power iteration —
  *    determinism over "run to convergence").
  *
  * The DuckDB oracle replays the identical sweeps in a recursive CTE
  * from the identical exact-integer moments, so the registry rows are
  * value-checked, not rows-only; per-sweep float noise (~1e-15, from
  * summation-order freedom in Σ_j A_ij·w_j) sits far inside the
  * round-4 emission.
  */
object Ridge {

  /** Exact fixed-point normal-equation moments in ONE aggregate pass:
    * (G as a dense symmetric d×d in true units, b in true units).
    * `scale` is the per-element fixed-point scale (1e3 → products in
    * 1e6 units; the [[GramMatrixFixed]] overflow budget applies). */
  def moments(emb: DataFrame, vecCol: String, labelCol: String, dims: Int,
      scale: Double): (Array[Array[Double]], Array[Double]) = {
    val xv = emb.select(
      Similarity.asDouble(col(vecCol)).as("v"),
      col(labelCol).cast("double").as("y"))
      .select(col("v"), transform(col("v"), x => x * col("y")).as("vy"))
    val row = xv.agg(
      GramMatrixFixed.gramFixed(col("v"), dims, scale).as("g"),
      VectorSumFixed.vecSumFixed(col("vy"), dims, scale).as("b")).head()
    val g2 = scale * scale
    val G = Array.ofDim[Double](dims, dims)
    row.getSeq[org.apache.spark.sql.Row](0).foreach { c =>
      val i = c.getInt(0); val j = c.getInt(1); val d = c.getLong(2) / g2
      G(i)(j) = d; G(j)(i) = d
    }
    val b = row.getSeq[Long](1).map(_ / scale).toArray
    (G, b)
  }

  /** `steps` damped-Jacobi sweeps on `(G + λI) w = b` from w₀ = 0;
    * returns the raw (un-rounded) iterate. Deterministic: ω and every
    * sweep derive only from the exact integer moments. */
  def jacobiSweeps(G: Array[Array[Double]], b: Array[Double], lambda: Double,
      steps: Int): Array[Double] = {
    val d = b.length
    // A = G + lambda I, applied on the fly; diag and row-ratio first
    val diag = Array.tabulate(d)(i => G(i)(i) + lambda)
    var maxRatio = 0.0
    var i = 0
    while (i < d) {
      var rs = 0.0
      var j = 0
      while (j < d) {
        rs += math.abs(if (i == j) G(i)(j) + lambda else G(i)(j)); j += 1
      }
      val r = rs / diag(i)
      if (r > maxRatio) maxRatio = r
      i += 1
    }
    val omega = 1.0 / maxRatio
    var w = new Array[Double](d)
    var t = 0
    while (t < steps) {
      val nw = new Array[Double](d)
      i = 0
      while (i < d) {
        var aw = 0.0
        var j = 0
        while (j < d) {
          aw += (if (i == j) G(i)(j) + lambda else G(i)(j)) * w(j); j += 1
        }
        // associativity is part of the oracle contract:
        // w + (omega * (b - aw)) / d  — mirrored verbatim in SQL
        nw(i) = w(i) + omega * (b(i) - aw) / diag(i)
        i += 1
      }
      w = nw
      t += 1
    }
    w
  }

  /** Round-4 weights — the shared emission both the fit frame and the
    * scoring pass use, so scores are dots with the SAME model on both
    * engines. */
  def fittedWeights(emb: DataFrame, dims: Int, scale: Double, lambda: Double,
      steps: Int): Array[Double] = {
    val (gm, b) = moments(emb, "embedding", "label", dims, scale)
    jacobiSweeps(gm, b, lambda, steps).map(x =>
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
  }

  /** Fit frame: one (i, weight) row per dimension. */
  def fitFrame(emb: DataFrame, dims: Int, scale: Double, lambda: Double,
      steps: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    fittedWeights(emb, dims, scale, lambda, steps).zipWithIndex
      .map { case (w, i) => (i, w) }.toSeq.toDF("i", "weight")
  }

  /** Scoring pass: the trained head rides as a LITERAL vector — one
    * codegen'd dot product per row, one scan, no shuffle, no UDF (the
    * s_model_score shape, but with weights LEARNED from the corpus's
    * own exact moments instead of minted). */
  def scoreFrame(emb: DataFrame, dims: Int, scale: Double, lambda: Double,
      steps: Int): DataFrame = {
    val w = array(fittedWeights(emb, dims, scale, lambda, steps)
      .map(lit(_)): _*)
    emb.select(col("vec_id"), col("label"),
        Similarity.asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        round(graft.functions.VectorDot.vecDot(col("v"), w), 4).as("yhat"))
  }
}
