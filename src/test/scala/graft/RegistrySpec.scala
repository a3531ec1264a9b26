package graft

/** Contract pins for the driver-facing registry itself: every query
  * must carry a DuckDB oracle (a missing entry silently downgrades
  * the driver's check to rows-only), names must be unique across the
  * bench's two timing namespaces, and the flagship entry must return
  * rows on the smoke fixture. */
class RegistrySpec extends SparkSpec {

  test("every registry query has an oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries missing an oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"oracles without a query: ${o.diff(q).toSeq.sorted}")
  }

  test("prepare-step names never shadow query names in the bench output") {
    val p = SparkEntry.prepareSteps.map(_._1)
    assert(p.distinct === p, "duplicate prepare-step names")
    val clash = p.toSet.intersect(SparkEntry.queries.keySet)
    assert(clash.isEmpty, s"prepare steps shadowing queries: $clash")
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
