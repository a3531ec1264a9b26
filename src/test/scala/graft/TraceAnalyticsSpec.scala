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
