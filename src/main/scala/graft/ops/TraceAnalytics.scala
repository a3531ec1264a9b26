package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trace-level analytics — the aggregations the reference delegates to
  * Zipkin (reference README.adoc:133-146: "select a particular trace",
  * "collection of traces → network of nodes and edges").
  */
object TraceAnalytics {

  /** Trace assembly: all spans of a trace, ordered, as one row. One
    * shuffle on trace_id (uniform hash keys — no skew by construction).
    * Span names are sorted and joined so the result is a stable scalar
    * the oracle can reproduce (arrays of structs hash differently
    * across engines). */
  def assembleTraces(spans: DataFrame): DataFrame =
    spans.groupBy("trace_id").agg(
      count(lit(1)).as("n_spans"),
      array_join(sort_array(collect_list(col("name"))), ",").as("span_names"),
      min("ts").as("trace_start"),
      max("ts").as("trace_end"))

  /** Zipkin-style dependency graph: service-to-service edge counts over
    * enriched send spans. Partial aggregation (map-side combine) makes
    * the shuffle tiny: cardinality = #edges, not #spans. */
  def dependencyGraph(spans: DataFrame): DataFrame =
    ContextOps.spanEnrich(spans)
      .filter(col("remote_service_name").isNotNull)
      .groupBy(col("local_service"), col("remote_service_name"))
      .agg(count(lit(1)).as("n_calls"))
}
