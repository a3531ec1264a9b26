package graft

import graft.ops.TraceAnalytics

/** Semantics pins for the bottom-up critical-path DP — the registry
  * oracle checks it only against the closed form of the modeled
  * depth-3 tree, so depth bounds, branching, forests and dangling
  * edges are pinned here. */
class TraceAnalyticsSpec extends SparkSpec {

  private def tree(rows: (String, String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("trace_id", "span_id", "parent_id", "duration_us")
  }

  test("critical path takes the max-duration branch of a branching tree") {
    val spans = tree(
      ("t1", "r", null, 10L),
      ("t1", "a", "r", 5L),
      ("t1", "b", "r", 20L),
      ("t1", "a1", "a", 100L), // deep-but-cheap vs shallow-but-hot
      ("t1", "b1", "b", 30L))
    val got = TraceAnalytics.criticalPath(spans, 3).collect()
    assert(got.length === 1)
    // r→a→a1 = 115 beats r→b→b1 = 60
    assert(got.head.getLong(1) === 5L && got.head.getLong(2) === 115L)
  }

  test("critical path handles chains deeper than 3 when maxDepth covers them, truncates when not") {
    val spans = tree(
      ("t1", "s0", null, 1L),
      ("t1", "s1", "s0", 2L),
      ("t1", "s2", "s1", 4L),
      ("t1", "s3", "s2", 8L))
    val full = TraceAnalytics.criticalPath(spans, 4).collect().head
    assert(full.getLong(2) === 15L)
    // maxDepth 2: the root extends only one level down — documented
    // truncation, not an error
    val trunc = TraceAnalytics.criticalPath(spans, 2).collect().head
    assert(trunc.getLong(2) === 3L)
  }

  test("a dangling parent edge becomes a local root instead of vanishing") {
    val spans = tree(
      ("t1", "r", null, 10L),
      ("t1", "a", "r", 5L),
      ("t1", "orphan", "missing-span", 99L))
    val got = TraceAnalytics.criticalPath(spans, 3).collect().head
    // the orphan's 99 beats the r→a 15 path; n_spans counts all three
    assert(got.getLong(1) === 3L && got.getLong(2) === 99L)
  }

  test("traces are independent and a forest takes the max over its roots") {
    val spans = tree(
      ("t1", "r1", null, 10L),
      ("t1", "r2", null, 30L),
      ("t1", "c", "r1", 15L),
      ("t2", "r", null, 7L))
    val got = TraceAnalytics.criticalPath(spans, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === Array(("t1", 3L, 30L), ("t2", 1L, 7L)))
  }

  private def svcTree(rows: (String, String, String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("trace_id", "span_id", "parent_id", "service", "duration_us")
  }

  test("critical-path decomposition emits the waterfall and sums to the headline") {
    val spans = svcTree(
      ("t1", "r", null, "gw", 100L),
      ("t1", "a", "r", "app", 50L),
      ("t1", "b", "r", "app", 400L),
      ("t1", "al", "a", "db", 500L)) // r→a→al = 650 beats r→b = 500
    val got = TraceAnalytics.criticalPathDecomposition(spans, 3).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got === Array((0, "r", "gw", 100L), (1, "a", "app", 50L),
      (2, "al", "db", 500L)))
    val headline = TraceAnalytics.criticalPath(spans, 3).collect().head.getLong(2)
    assert(got.map(_._4).sum === headline)
  }

  test("decomposition backtracks per-depth frames: truncated topologies still sum exactly") {
    // Deeper than maxDepth=4: x's short chain (20) wins the TRUNCATED
    // headline, but y's deep chain (100 at depth 4) wins the FINAL
    // frame's longer-horizon argmax at c1 — a naive walk over the last
    // frame would follow y and sum 1, not 21. The per-depth backtrack
    // must follow x.
    val spans = svcTree(
      ("t1", "root", null, "gw", 1L),
      ("t1", "c1", "root", "app", 0L),
      ("t1", "x", "c1", "svc-x", 0L),
      ("t1", "x1", "x", "svc-x", 20L),
      ("t1", "y", "c1", "svc-y", 0L),
      ("t1", "y1", "y", "svc-y", 0L),
      ("t1", "y2", "y1", "svc-y", 100L))
    val got = TraceAnalytics.criticalPathDecomposition(spans, 4).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(4))).sortBy(_._1)
    assert(got === Array((0, "root", 1L), (1, "c1", 0L), (2, "x", 0L),
      (3, "x1", 20L)))
    val headline = TraceAnalytics.criticalPath(spans, 4).collect().head.getLong(2)
    assert(got.map(_._3).sum === headline)
  }

  test("decomposition tie-breaks the argmax child by span id, deterministically") {
    val spans = svcTree(
      ("t1", "r", null, "gw", 1L),
      ("t1", "a", "r", "app", 7L), // equal paths: max span_id wins
      ("t1", "b", "r", "app", 7L))
    val got = TraceAnalytics.criticalPathDecomposition(spans, 2).collect()
      .map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(got === Array((0, "r"), (1, "b")))
  }

  private def hopRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
      r.getString(3), r.getLong(4))).sorted.toSeq

  test("per-trace fold is row-for-row the declarative decomposition on tricky topologies") {
    val cases = Seq(
      // branching
      (svcTree(("t1", "r", null, "gw", 100L), ("t1", "a", "r", "app", 50L),
        ("t1", "b", "r", "app", 400L), ("t1", "al", "a", "db", 500L)), 3),
      // deeper than maxDepth: per-depth backtrack must truncate identically
      (svcTree(("t1", "root", null, "gw", 1L), ("t1", "c1", "root", "app", 0L),
        ("t1", "x", "c1", "svc-x", 0L), ("t1", "x1", "x", "svc-x", 20L),
        ("t1", "y", "c1", "svc-y", 0L), ("t1", "y1", "y", "svc-y", 0L),
        ("t1", "y2", "y1", "svc-y", 100L)), 4),
      // argmax tie on path: span-id order decides in both
      (svcTree(("t1", "r", null, "gw", 1L), ("t1", "a", "r", "app", 7L),
        ("t1", "b", "r", "app", 7L)), 2),
      // duplicate span ids multiply through the backtrack joins
      (svcTree(("t1", "r", null, "gw", 1L), ("t1", "a", "r", "app", 7L),
        ("t1", "a", "r", "app2", 7L)), 2),
      // dangling parent = local root; forest takes max root
      (svcTree(("t1", "r1", null, "gw", 10L), ("t1", "r2", null, "gw", 30L),
        ("t1", "c", "r1", "db", 15L), ("t1", "o", "gone", "db", 99L),
        ("t2", "r", null, "gw", 7L)), 3))
    for (((spans, depth), i) <- cases.zipWithIndex) {
      val fold = hopRows(TraceAnalytics.criticalPathFold(spans, depth))
      val decl = hopRows(TraceAnalytics.criticalPathDecomposition(spans, depth))
      assert(fold === decl, s"fold/decomposition divergence in case $i")
      assert(fold.nonEmpty)
    }
  }

  test("per-trace fold matches the declarative decomposition on a randomized forest sweep") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).flatMap { t =>
      val n = 1 + rnd.nextInt(9)
      (0 until n).map { i =>
        val parent =
          if (i == 0 || rnd.nextInt(10) == 0) null
          else if (rnd.nextInt(12) == 0) s"gone-${rnd.nextInt(3)}" // dangling
          else s"s${rnd.nextInt(i)}" // any earlier span
        // occasional duplicate ids: two spans named s<i-1>
        val id = if (i > 1 && rnd.nextInt(15) == 0) s"s${i - 1}" else s"s$i"
        (s"t$t", id, parent, s"svc${rnd.nextInt(4)}", rnd.nextInt(1000).toLong)
      }
    }
    val spans = svcTree(rows: _*)
    for (depth <- Seq(2, 3, 5)) {
      val fold = hopRows(TraceAnalytics.criticalPathFold(spans, depth))
      val decl = hopRows(TraceAnalytics.criticalPathDecomposition(spans, depth))
      assert(fold === decl, s"divergence at depth $depth")
      assert(fold.nonEmpty)
    }
  }

  test("blame picks the hop with max excess over the topology-class mean, slow traces only") {
    // class n_spans=2, three traces; t3's hop-1 child is what blew up:
    // class means (root 35/3, child 40) -> t3 excess (hop0 10/3*... ,
    // hop1 60) -> blame hop 1. thr = mean + 1*stddev of (20,20,115).
    val spans = svcTree(
      ("t1", "r1", null, "gw", 10L), ("t1", "c1", "r1", "db", 10L),
      ("t2", "r2", null, "gw", 10L), ("t2", "c2", "r2", "db", 10L),
      ("t3", "r3", null, "gw", 15L), ("t3", "c3", "r3", "db", 100L))
    val cp = TraceAnalytics.criticalPath(spans, 2)
    val hops = TraceAnalytics.criticalPathDecomposition(spans, 2)
    val got = TraceAnalytics.criticalBlame(cp, hops, 1.0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getDouble(6)))
    assert(got === Array(("t3", 2L, 1, "c3", "db", 100L, 100.0 - 120.0 / 3)))
  }

  test("blame ties on scaled excess break deterministically toward the deeper hop") {
    // both of t2's hops exceed their class mean by exactly 5 (scaled
    // excess 10 each) -> the struct argmax must take the HIGHER hop
    val spans = svcTree(
      ("t1", "r1", null, "gw", 0L), ("t1", "c1", "r1", "db", 0L),
      ("t2", "r2", null, "gw", 10L), ("t2", "c2", "r2", "db", 10L))
    val cp = TraceAnalytics.criticalPath(spans, 2)
    val hops = TraceAnalytics.criticalPathDecomposition(spans, 2)
    val got = TraceAnalytics.criticalBlame(cp, hops, 0.5).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3), r.getDouble(6)))
    assert(got === Array(("t2", 1, "c2", 5.0)))
  }

  test("edge durations pair each child with its parent's service and keep the child's time") {
    import spark.implicits._
    val spans = Seq(
      ("t1", "r", null, 10L, "gw"),
      ("t1", "a", "r", 5L, "app"),
      ("t1", "b", "r", 20L, "app"),
      ("t1", "a1", "a", 100L, "db"),
      ("t2", "r", null, 1L, "gw"),
      ("t2", "orphan", "missing", 9L, "db")) // dangling: no edge row
      .toDF("trace_id", "span_id", "parent_id", "duration_us", "service")
    val got = TraceAnalytics.edgeDurations(spans).as[(String, Double)]
      .collect().sorted
    assert(got === Array(("app>db", 100.0), ("gw>app", 5.0), ("gw>app", 20.0)))
  }

  test("anomaly baseline is per topology class; lone classes emit no threshold") {
    import spark.implicits._
    val cp = Seq(
      ("a", 2L, 20L), ("b", 2L, 20L), ("c", 2L, 20L), ("d", 2L, 20L),
      ("e", 2L, 20L), ("slow", 2L, 510L),
      ("lone", 5L, 999L)) // single-trace class: stddev null, dropped
      .toDF("trace_id", "n_spans", "critical_path_us")
    val base = TraceAnalytics.anomalyBaseline(cp, 1.0).collect()
    assert(base.map(_.getLong(0)).toSeq === Seq(2L))
    val flagged = TraceAnalytics.traceAnomalies(cp, 1.0)
      .as[(String, Long, Long)].collect().toSet
    // mu=101.67, sample sigma=200.04 ⇒ threshold ~301.7: only the outlier
    assert(flagged === Set(("slow", 2L, 510L)))
  }
}
