package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Behavioral pins for the fixed-point PageRank operator: the
  * distributed iterate must equal an in-memory replica of the exact
  * integer recurrence (the contract the DuckDB oracle replays), and
  * the ranking must behave like PageRank (hubs outrank leaves, total
  * mass stays bounded). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory replica of the exact recurrence: p' = teleport(v) +
    * (85 · Σ (p_src·w) / wout_src) / 100, all longs, truncating
    * division (non-negative, so truncation = floor = SQL div).
    * `seeds = None` is uniform PageRank (every vertex teleports). */
  private def ref(edges: Seq[(String, String, Long)], iters: Int,
      seeds: Option[Set[String]] = None): Map[String, Long] = {
    val wout = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def isSeed(v: String) = seeds.forall(_.contains(v))
    var p = verts.map(v => v -> (if (isSeed(v)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      edges.foreach { case (s, d, w) => contrib(d) += (p(s) * w) / wout(s) }
      p = verts.map(v => v ->
        ((if (isSeed(v)) 150000L else 0L) + (85L * contrib(v)) / 100L)).toMap
    }
    p
  }

  private def symmetricTestGraph: Seq[(String, String, Long)] = {
    val dir = for {
      i <- 0 until 12
      (j, w) <- Seq(((i * 5 + 3) % 12, (i % 3 + 1).toLong), ((i * 7 + 1) % 12, 2L))
      if i != j
    } yield (s"n$i", s"n$j", w)
    // symmetrize and merge duplicate directed edges by summing weights
    (dir ++ dir.map { case (a, b, w) => (b, a, w) })
      .groupBy(e => (e._1, e._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).sum) }
      .toSeq
  }

  test("pageRankFixed equals the in-memory exact-integer replica") {
    val edges = symmetricTestGraph
    val got = Graph.pageRankFixed(edges.toDF("src", "dst", "w"), 5)
      .as[(String, Long)].collect().toMap
    assert(got === ref(edges, 5))
  }

  test("star center outranks its leaves; leaves tie exactly") {
    val leaves = (1 to 6).map(i => s"l$i")
    val edges = leaves.flatMap(l => Seq(("hub", l, 1L), (l, "hub", 1L)))
    val pr = Graph.pageRankFixed(edges.toDF("src", "dst", "w"), 5)
      .as[(String, Long)].collect().toMap
    assert(pr("hub") > pr("l1"), "the hub must concentrate rank")
    assert(leaves.map(pr).distinct.size === 1, "symmetric leaves must tie bit-for-bit")
  }

  test("personalized pageRank equals the seeded replica and concentrates near seeds") {
    val edges = symmetricTestGraph
    val seeds = Set("n0", "n1")
    val got = Graph.pageRankFixed(edges.toDF("src", "dst", "w"), 5,
        seeds = Some(Seq("n0", "n1").toDF("node")))
      .as[(String, Long)].collect().toMap
    assert(got === ref(edges, 5, Some(seeds)))
    // a seed always retains at least its teleport; total seeded mass
    // is far below the uniform run's (only seeds inject mass)
    assert(seeds.forall(got(_) >= 150000L))
    assert(got.values.sum < ref(edges, 5).values.sum)
  }

  test("triangle count: K4 has 4, a path has 0, a star has 0") {
    def undirected(pairs: Seq[(Long, Long)]) = pairs.toDF("doc_a", "doc_b")
    def count(pairs: Seq[(Long, Long)]): (Long, Long) =
      Graph.triangleCount(undirected(pairs)).as[(Long, Long)].head()
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(count(k4) === ((6L, 4L)))
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === ((3L, 0L)))
    assert(count((2L to 7L).map(l => (1L, l))) === ((6L, 0L)),
      "hub wedges must not close without a third edge")
    // triangle + pendant edge: exactly one
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) === ((4L, 1L)))
  }

  private def sym(pairs: Seq[(String, String)]) =
    pairs.flatMap { case (a, b) => Seq((a, b, 1L), (b, a, 1L)) }.toDF("src", "dst", "w")

  test("kCorePeel on a path cascades inward; on a cycle the 2-core survives") {
    val path = sym(Seq(("v0", "v1"), ("v1", "v2"), ("v2", "v3"), ("v3", "v4")))
    val got = Graph.kCorePeel(path, 2, 4)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // endpoints (deg 1) fall round 1, exposing v1/v3 (round 2), then v2
    assert(got === Map(
      "v0" -> ((0L, 1L)), "v4" -> ((0L, 1L)),
      "v1" -> ((0L, 2L)), "v3" -> ((0L, 2L)),
      "v2" -> ((0L, 3L))))
    val cycle = sym(Seq(("v0", "v1"), ("v1", "v2"), ("v2", "v3"), ("v3", "v0")))
    val core = Graph.kCorePeel(cycle, 2, 4)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(core.values.forall(_ == ((1L, 0L))), "a cycle IS its own 2-core")
  }

  test("bfsHops on a path: dist = index from the seed, NULL beyond the depth bound") {
    val path = sym(Seq(("v0", "v1"), ("v1", "v2"), ("v2", "v3"), ("v3", "v4")))
    val got = Graph.bfsHops(path, Seq("v0").toDF("node"), 2)
      .as[(String, Option[Long])].collect().toMap
    assert(got === Map("v0" -> Some(0L), "v1" -> Some(1L), "v2" -> Some(2L),
      "v3" -> None, "v4" -> None))
  }

  test("commonNeighborPairs: hub neighbors above the df cap generate no candidates") {
    // u1,u2 share {p1,p2}; everyone shares hub p9 (df 4 > cap 3)
    val inc = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L)).toDF("u", "v")
    val got = Graph.commonNeighborPairs(inc, 3, 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    // n_common counts capped neighbors only; Jaccard uses FULL
    // neighborhoods: |{p1,p2} ∩ {p1,p2}| = 2, union = 3+3-2 = 4
    assert(got === Set((1L, 2L, 2L, 5000L)))
  }

  test("total mass never exceeds the initial |V|·scale (overflow-budget premise)") {
    val edges = symmetricTestGraph
    val n = (edges.map(_._1) ++ edges.map(_._2)).distinct.size
    val total = Graph.pageRankFixed(edges.toDF("src", "dst", "w"), 8)
      .agg(sum(col("pr_fx"))).as[Long].head()
    // the damped update with truncating division only loses mass, so
    // the documented p·w ≲ |V|·scale·w_max budget is conservative
    assert(total <= n * 1000000L)
  }

  /** In-memory replica of the synchronous LPA recurrence with the
    * (−weight, label) argmin tie-break. */
  private def lpaRef(edges: Seq[(String, String, Long)], iters: Int): Map[String, String] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var lab = verts.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lab = edges.groupBy(_._2).map { case (dst, es) =>
        val scores = es.groupBy(e => lab(e._1))
          .map { case (l, ws) => (l, ws.map(_._3).sum) }
        dst -> scores.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("labelPropagation equals the in-memory replica and separates two bridged cliques") {
    // two 4-cliques joined by one weak bridge edge
    def clique(p: String) = for {
      i <- 0 until 4; j <- 0 until 4 if i != j
    } yield (s"$p$i", s"$p$j", 10L)
    val edges = clique("a") ++ clique("b") ++ Seq(("a0", "b0", 1L), ("b0", "a0", 1L))
    val got = Graph.labelPropagation(edges.toDF("src", "dst", "w"), 4)
      .as[(String, String)].collect().toMap
    assert(got === lpaRef(edges, 4))
    val aComm = (0 until 4).map(i => got(s"a$i")).toSet
    val bComm = (0 until 4).map(i => got(s"b$i")).toSet
    assert(aComm.size === 1 && bComm.size === 1,
      s"each clique must agree on one label: $got")
    assert(aComm != bComm, "the weak bridge must not merge the cliques")
  }

  test("labelPropagation matches the replica on the irregular weighted graph") {
    val edges = symmetricTestGraph
    val got = Graph.labelPropagation(edges.toDF("src", "dst", "w"), 3)
      .as[(String, String)].collect().toMap
    assert(got === lpaRef(edges, 3))
  }

  test("a sink vertex fails loudly instead of silently leaking rank mass") {
    // c appears only as a destination: its mass would vanish each step
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 1L))
    val e = intercept[Exception] {
      Graph.pageRankFixed(edges.toDF("src", "dst", "w"), 3).collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: messages(t.getCause)
    assert(messages(e).exists(_.contains("no out-edges")), s"got: $e")
  }

  test("sink-free asymmetric graphs still rank (mass conserved up to truncation)") {
    // directed 4-cycle with a chord: asymmetric, but every vertex has
    // an out-edge, so the guard must NOT fire and total mass must stay
    // at ~|V|·scale (damped: teleport + 0.85·mass, fixpoint |V|·scale)
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("d", "a", 1L), ("a", "c", 2L))
    val got = Graph.pageRankFixed(edges.toDF("src", "dst", "w"), 5)
      .as[(String, Long)].collect()
    assert(got.length === 4)
    val total = got.map(_._2).sum
    // truncating division only ever loses mass; 5 steps on 4 vertices
    // lose at most a few units per vertex per step
    assert(total <= 4L * 1000000L && total > 4L * 1000000L - 1000L,
      s"mass not conserved: $total")
  }

  test("localClustering: K4 corners fully clustered, a pendant apex halves") {
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)) :+ ((4L, 5L))
    val got = Graph.localClustering(k4.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // K4 corners: every vertex sits in 3 triangles over C(3,2)=3
    // wedges → cc 1.0; vertex 4 gains the pendant edge (degree 4,
    // still 3 triangles over 6 wedges → 0.5); the degree-1 pendant
    // has no defined coefficient and must be absent
    assert(got === Map(
      1L -> ((3L, 3L, 10000L)), 2L -> ((3L, 3L, 10000L)),
      3L -> ((3L, 3L, 10000L)), 4L -> ((4L, 3L, 5000L))))
    val path = Graph.localClustering(
        Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(path === Set((2L, 2L, 0L, 0L)),
      "a triangle-free wedge center must score exactly zero")
  }

  test("modularity: the two-triangle partition scores 0.5; one blob scores 0") {
    val tris = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"))
    val edges = tris.flatMap { case (x, y) => Seq((x, y, 1L), (y, x, 1L)) }
      .toDF("src", "dst", "w")
    val parts = Seq("a" -> "t1", "b" -> "t1", "c" -> "t1",
      "d" -> "t2", "e" -> "t2", "f" -> "t2").toDF("node", "community")
    val got = Graph.modularity(edges, parts)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // M=12, intra=k=6 per community: q = 1e6/2 − (1e6/2)²/1e6 = 0.25
    assert(got === Map(
      "t1" -> ((3L, 6L, 6L, 250000L)),
      "t2" -> ((3L, 6L, 6L, 250000L))))
    val blob = Seq("a", "b", "c", "d", "e", "f").map(_ -> "all")
      .toDF("node", "community")
    val q = Graph.modularity(edges, blob)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(q.map(_._5).sum === 0L, "a single community always has Q = 0")
  }
}
