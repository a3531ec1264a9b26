package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain DataFrames — the Pregel-style
  * complement of [[graft.ext.Dedup.nearDupComponents]]' label
  * propagation, for graphs where the answer is a per-vertex score
  * rather than a component id.
  */
object Graph {

  /** Weighted PageRank in EXACT fixed-point arithmetic, bounded
    * iterations (Brin & Page 1998, the power-iteration form).
    *
    * Everything is long arithmetic so the result is order-,
    * partition- and engine-independent: rank starts at `scale` per
    * vertex; each step every vertex receives
    * `sum((p_src * w) div wout_src)` over its in-edges and is
    * re-ranked `teleport + (dampNum * contrib) div dampDen` with
    * `teleport = (scale * (dampDen - dampNum)) div dampDen`. Integral
    * `div` on non-negative longs is identical in Spark (truncate) and
    * DuckDB (`//`, floor), which is what lets a recursive-CTE oracle
    * replay the identical iteration.
    *
    * Distributed shape: each iteration is ONE join of the rank frame
    * against the (checkpointed, degree-annotated) edge list keyed on
    * vertex id plus one partial-agg'd sum keyed on the destination —
    * both shuffles are id-hash uniform, nothing is ever collected.
    * Iteration count is fixed (a handful of power steps ranks a
    * dependency/purchase graph; convergence testing would add a
    * count() job per step for no semantic gain — the fixpoint is not
    * the contract, the bounded iterate is). The edge and vertex
    * frames ARE localCheckpoint'ed (each is referenced every
    * iteration — uncheckpointed they would recompute per reference),
    * but the rank chain deliberately is NOT: unlike
    * [[graft.ext.Dedup.nearDupComponents]]' open-ended sweep loop
    * with mid-loop count() actions, this loop is a bounded unroll
    * with a single terminal action, so the `iters`-stage plan runs as
    * ONE job — per-step checkpoints measured 6.65 s vs ~2 s at
    * sf0.1/local[32] purely from `iters` serial job barriers. Set
    * `checkpointEvery` > 0 for iteration counts large enough that
    * plan size itself becomes the problem (~dozens).
    *
    * Overflow budget (documented, not guarded — column arithmetic has
    * no addExact): total mass stays ~|V|·scale under the damped
    * update, so `p · w` needs |V|·scale·w_max ≲ 2^63 — at
    * scale=10^6 that is ~10^9 vertices with hub weights ~10^4. Lower
    * `scale` for larger graphs.
    *
    * Vertices with no out-edges leak their mass (the simplified
    * PageRank without a dangling-mass redistribution term); on a
    * symmetric edge list — the intended use — there are none.
    *
    * Input: edges (src: String, dst: String, w: Long).
    * Returns (node, pr_fx: Long) after `iters` steps. */
  def pageRankFixed(edges: DataFrame, iters: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen, s"damping $dampNum/$dampDen not in (0,1)")
    val teleport = (scale * (dampDen - dampNum)) / dampDen
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val e = edges.join(outw, "src")
      .select(col("src"), col("dst"), col("w").cast("long").as("w"),
        col("wout").cast("long").as("wout"))
      .localCheckpoint()
    val verts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    var pr = verts.withColumn("p", lit(scale))
    for (i <- 1 to iters) {
      val contrib = e.join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(p * w) div wout")).as("c"))
      pr = verts.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * coalesce(c, 0L)) div $dampDen"))
            .as("p"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        pr = pr.localCheckpoint()
    }
    pr.select(col("node"), col("p").as("pr_fx"))
  }
}
