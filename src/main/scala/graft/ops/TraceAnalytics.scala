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

  /** Critical path per trace: the maximum-duration root-to-leaf path
    * over parent_id edges — the per-trace latency view Zipkin renders
    * (reference README.adoc:133-135) reduced to its headline number.
    *
    * Distributed shape: bottom-up dynamic programming bounded by
    * `maxDepth` (span-tree depth is an application constant — the
    * topology's hop count — never data-sized). Iteration k extends
    * each span's best downward path to height ≤ k via ONE
    * (trace_id, parent_id)-keyed partial aggregate joined back to the
    * span frame; no recursion, no driver-side graph walk, and every
    * shuffle key is a (trace, span) id hash — uniform by
    * construction. Roots are spans whose parent is null or absent
    * from the corpus (anti-join on span ids), so dangling edges
    * surface as local roots instead of silently vanishing. Spans
    * deeper than `maxDepth` contribute truncated paths — callers pass
    * the topology's known depth.
    *
    * Input: (trace_id, span_id, parent_id, duration_us, ...).
    * Returns (trace_id, n_spans, critical_path_us). */
  def criticalPath(spans: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val base = spans.select(col("trace_id"), col("span_id"), col("parent_id"),
      col("duration_us").cast("long").as("duration_us"))
    var best = base.withColumn("path_us", col("duration_us"))
    for (_ <- 1 until maxDepth) {
      val childMax = best.filter(col("parent_id").isNotNull)
        .groupBy(col("trace_id").as("t"), col("parent_id").as("p"))
        .agg(max(col("path_us")).as("child_us"))
      best = base
        .join(childMax,
          col("trace_id") === col("t") && col("span_id") === col("p"), "left")
        .select(col("trace_id"), col("span_id"), col("parent_id"), col("duration_us"),
          (col("duration_us") + coalesce(col("child_us"), lit(0L))).as("path_us"))
    }
    val ids = base.select(col("trace_id").as("t2"), col("span_id").as("s2"))
    val roots = best.join(ids,
      col("trace_id") === col("t2") && col("parent_id") === col("s2"), "left_anti")
    val sizes = base.groupBy("trace_id").agg(count(lit(1)).as("n_spans"))
    roots.groupBy("trace_id").agg(max(col("path_us")).as("critical_path_us"))
      .join(sizes, "trace_id")
      .select(col("trace_id"), col("n_spans"), col("critical_path_us"))
  }

  /** Critical-path DECOMPOSITION: the latency waterfall — one row per
    * span ON the critical path, `(trace_id, hop, span_id, service,
    * duration_us)` with hop 0 at the chosen root. This is the view a
    * latency tool actually renders (which hops make up the slow
    * trace), where [[criticalPath]] reports only the headline sum;
    * per trace, the emitted `duration_us` sum to `critical_path_us`
    * exactly (spec-pinned).
    *
    * Shape: the same depth-bounded bottom-up DP as [[criticalPath]],
    * but each iteration also records WHICH child realized each span's
    * best path (`max(struct(path_us, span_id))` — ties break on span
    * id, so the argmax is deterministic and the DuckDB oracle can
    * reproduce it). The walk back down is proper DP BACKTRACKING: hop
    * k follows the pointer recorded in the depth-(maxDepth−1−k)
    * frame — the argmax its parent's value actually counted — so the
    * decomposition sums exactly even on topologies DEEPER than
    * `maxDepth` (the final frame's pointers alone would chase a
    * longer-horizon argmax the truncated headline never counted).
    * Every join keys on the uniform (trace, span) id hash, output is
    * traces × depth rows, and depth is the topology's constant, so
    * the extra joins are a constant factor, never data-sized. */
  def criticalPathDecomposition(spans: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val base = spans.select(col("trace_id"), col("span_id"), col("parent_id"),
      col("service"), col("duration_us").cast("long").as("duration_us"))
    var best = base.withColumn("path_us", col("duration_us"))
      .withColumn("next_id", lit(null).cast("string"))
    var frames = List(best) // frames(i) = best after i DP iterations
    for (_ <- 1 until maxDepth) {
      val childBest = best.filter(col("parent_id").isNotNull)
        .groupBy(col("trace_id").as("t"), col("parent_id").as("p"))
        .agg(max(struct(col("path_us"), col("span_id"))).as("m"))
        .select(col("t"), col("p"), col("m.path_us").as("child_us"),
          col("m.span_id").as("child_id"))
      best = base
        .join(childBest,
          col("trace_id") === col("t") && col("span_id") === col("p"), "left")
        .select(col("trace_id"), col("span_id"), col("parent_id"), col("service"),
          col("duration_us"),
          (col("duration_us") + coalesce(col("child_us"), lit(0L))).as("path_us"),
          col("child_id").as("next_id"))
      frames = best :: frames
    }
    // frames is now (depth maxDepth−1, …, depth 0); hop k backtracks
    // through frames(k)
    val ids = base.select(col("trace_id").as("t2"), col("span_id").as("s2"))
    val rootStart = best
      .join(ids, col("trace_id") === col("t2") && col("parent_id") === col("s2"),
        "left_anti")
      .groupBy(col("trace_id"))
      .agg(max(struct(col("path_us"), col("span_id"))).as("m"))
      .select(col("trace_id"), col("m.span_id").as("span_id"))
    var cur = rootStart
    val hops = frames.zipWithIndex.map { case (frame, k) =>
      val keyed = frame.select(col("trace_id"), col("span_id"), col("service"),
        col("duration_us"), col("next_id"))
      val step = cur.join(keyed, Seq("trace_id", "span_id"))
      cur = step.filter(col("next_id").isNotNull)
        .select(col("trace_id"), col("next_id").as("span_id"))
      step.select(col("trace_id"), lit(k).as("hop"), col("span_id"),
        col("service"), col("duration_us"))
    }
    hops.reduce(_ unionByName _)
  }

  /** One critical-path hop row — the [[criticalPathDecomposition]]
    * output shape. */
  case class Hop(trace_id: String, hop: Int, span_id: String,
      service: String, duration_us: Long)

  /** Encoder-visible span row of [[criticalPathFold]] (a private class
    * breaks the deserializer's codegen — same constraint as the
    * streaming twin's SpanRec). */
  case class SpanRow(trace_id: String, span_id: String,
      parent_id: String, service: String, duration_us: Long)

  /** The per-trace DP + backtrack kernel behind [[criticalPathFold]]:
    * [[criticalPathDecomposition]]'s recurrence replayed literally over
    * ONE trace's rows — per-depth frames with `max(struct(path_us,
    * span_id))` argmax pointers (ties toward the larger span id, the
    * same binary order for the ASCII ids both engines compare), root =
    * argmax over spans whose parent is null or absent, hop k
    * backtracking through the depth-(maxDepth−1−k) frame. Duplicate
    * span ids multiply exactly like the DataFrame joins do (every
    * frame row matching the followed pointer emits, and each non-null
    * pointer is followed with multiplicity). */
  private[graft] def hopsOf(rows: Seq[(String, String, String, Long)],
      maxDepth: Int): Iterator[Hop] = {
    if (rows.isEmpty) return Iterator.empty
    // (span_id, parent_id, service, duration), path, next pointer
    var cur: Vector[((String, String, String, Long), Long, String)] =
      rows.iterator.map(r => (r, r._4, null: String)).toVector
    var frames = List(cur)
    for (_ <- 1 until maxDepth) {
      val childBest = cur.iterator.filter(_._1._2 != null)
        .foldLeft(Map.empty[String, (Long, String)]) { case (m, (r, p, _)) =>
          val keep = m.get(r._2) match {
            case Some((pp, ps)) if pp > p || (pp == p && ps > r._1) => (pp, ps)
            case _ => (p, r._1)
          }
          m.updated(r._2, keep)
        }
      cur = cur.map { case (r, _, _) =>
        childBest.get(r._1) match {
          case Some((cp, cid)) => (r, r._4 + cp, cid)
          case None => (r, r._4, null: String)
        }
      }
      frames = cur :: frames
    }
    val ids = rows.iterator.map(_._1).toSet
    val roots = cur.filter(t => t._1._2 == null || !ids.contains(t._1._2))
    if (roots.isEmpty) return Iterator.empty
    val start = roots.maxBy(t => (t._2, t._1._1))._1._1
    val out = scala.collection.mutable.ListBuffer.empty[(Int, (String, String, String, Long))]
    var curIds: List[String] = List(start)
    frames.zipWithIndex.foreach { case (frame, k) =>
      val byId = frame.groupBy(_._1._1)
      val matched = curIds.flatMap(c => byId.getOrElse(c, Vector.empty))
      matched.foreach { case (r, _, _) => out += ((k, r)) }
      curIds = matched.flatMap { case (_, _, next) => Option(next) }
    }
    out.iterator.map { case (k, r) =>
      Hop(null, k, r._1, r._3, r._4) // trace_id filled by the caller
    }
  }

  /** [[criticalPathDecomposition]] as a per-trace fold — the
    * single-shuffle form. The iterate-and-join DP re-shuffles the span
    * corpus on a (trace, span)-id key TWICE PER DEPTH LEVEL (one
    * child-max aggregate + one join back, then the backtrack joins);
    * but a trace's span set is application-bounded (the topology's
    * fan-out × depth, never data-sized), so the corpus-scale shape is
    * ONE groupByKey(trace_id) shuffle with the DP and backtrack run
    * in memory per trace — the exact shape the streaming twin already
    * uses as traces close. Output is row-for-row
    * [[criticalPathDecomposition]] (spec-pinned on branching, deep,
    * dangling, duplicate-id and forest topologies); the declarative
    * twin remains the cross-check and the shape documentation. */
  def criticalPathFold(spans: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    import org.apache.spark.sql.{Dataset, Encoders}
    implicit val rowEnc = Encoders.product[SpanRow]
    implicit val hopEnc = Encoders.product[Hop]
    implicit val strEnc = Encoders.STRING
    val ds: Dataset[SpanRow] = spans.select(col("trace_id"), col("span_id"),
        col("parent_id"), col("service"),
        col("duration_us").cast("long").as("duration_us"))
      .as[SpanRow]
    ds.groupByKey(_.trace_id)
      .flatMapGroups { (t: String, it: Iterator[SpanRow]) =>
        val rows = it.map(r => (r.span_id, r.parent_id, r.service, r.duration_us)).toVector
        hopsOf(rows, maxDepth).map(h => h.copy(trace_id = t))
      }
      .toDF()
  }

  /** Per-dependency-edge child-span durations — the latency face of
    * [[dependencyGraph]] (Zipkin's dependency view annotates each link
    * with call volume; a production view wants the link's latency
    * distribution too). One row per parent→child span pair, keyed
    * `parent_service + '>' + child_service` and carrying the CHILD
    * span's duration (the time the parent spent in that dependency).
    * One shuffle join on the uniform (trace_id, span_id) hash key —
    * the parent side is the span frame itself, never a broadcast
    * candidate, and downstream percentile machinery aggregates by
    * edge (cardinality = #edges in the topology). Feed to
    * [[ExactPercentiles.of]] for (k, x) percentiles. */
  def edgeDurations(spans: DataFrame): DataFrame = {
    val parents = spans.select(col("trace_id").as("pt"), col("span_id").as("ps"),
      col("service").as("parent_service"))
    spans.filter(col("parent_id").isNotNull)
      .join(parents, col("trace_id") === col("pt") && col("parent_id") === col("ps"))
      .select(concat(col("parent_service"), lit(">"), col("service")).as("k"),
        col("duration_us").cast("double").as("x"))
  }

  /** Slow-trace threshold per topology class: traces with the same
    * span count follow the same modeled topology, so their
    * critical-path distribution is comparable; the baseline is
    * mean + z·stddev (sample) of `critical_path_us` within each
    * `n_spans` class. Classes with a single trace (stddev null) emit
    * no threshold — a lone trace has no distribution to be an outlier
    * of. Output (n_spans, threshold_us, n_traces) is topology-sized:
    * always broadcastable, and the static frame the streaming
    * slow-trace gate probes against. */
  def anomalyBaseline(criticalPaths: DataFrame, z: Double): DataFrame =
    criticalPaths.groupBy(col("n_spans"))
      .agg((avg(col("critical_path_us")) +
        lit(z) * stddev(col("critical_path_us"))).as("threshold_us"),
        count(lit(1)).as("n_traces"))
      .filter(col("threshold_us").isNotNull)

  /** Anomalously slow traces: critical path above the
    * [[anomalyBaseline]] threshold of the trace's topology class —
    * Zipkin's "find the slow traces" sweep as one broadcast join
    * (baseline is topology-sized) over the critical-path frame. */
  def traceAnomalies(criticalPaths: DataFrame, z: Double): DataFrame =
    criticalPaths
      .join(broadcast(anomalyBaseline(criticalPaths, z)
        .select(col("n_spans"), col("threshold_us"))), Seq("n_spans"))
      .filter(col("critical_path_us") > col("threshold_us"))
      .select(col("trace_id"), col("n_spans"), col("critical_path_us"))

  /** Root-cause attribution for slow traces: for each
    * [[traceAnomalies]] trace, the critical-path hop whose duration
    * grew MOST over its topology-class norm — the answer to "this
    * trace is slow; which service did it" that a latency tool renders
    * next to the waterfall. The norm for a hop is the mean
    * `duration_us` of that hop position across ALL traces of the same
    * `n_spans` class (same class logic as the anomaly sweep; the hop
    * frame is [[criticalPathDecomposition]]'s output).
    *
    * Determinism across engines: the argmax compares the
    * INTEGER-scaled excess `duration_us · class_n − class_sum_us`
    * (same order as `duration − mean`, no float summation-order
    * hazard), then hop, then span id — so the DuckDB oracle reproduces
    * the pick exactly. The reported `excess_us` is computed as
    * `double(duration) − double(class_sum)/double(class_n)` — both
    * engines evaluate the identical two IEEE ops on exactly
    * representable integers.
    *
    * Scale shape: the class norm table is topology-sized
    * (#classes × depth rows) and broadcast; the hop frame joins it
    * map-side, the slow-trace filter is a semi-join on the uniform
    * trace-id hash, and the argmax is one partial-aggregating
    * `max(struct(...))` per trace. Nothing here is corpus-sized
    * except the single pass over the hop frame.
    *
    * Returns (trace_id, n_spans, hop, span_id, service, duration_us,
    * excess_us). */
  def criticalBlame(criticalPaths: DataFrame, hops: DataFrame,
      z: Double): DataFrame = {
    val slow = traceAnomalies(criticalPaths, z).select(col("trace_id"))
    val classes = criticalPaths.select(col("trace_id"), col("n_spans"))
    val hopsC = hops.join(classes, Seq("trace_id"))
    val norms = hopsC.groupBy(col("n_spans"), col("hop"))
      .agg(sum(col("duration_us")).as("class_sum_us"),
        count(lit(1)).as("class_n"))
    hopsC.join(broadcast(norms), Seq("n_spans", "hop"))
      .join(slow, Seq("trace_id"), "left_semi")
      .groupBy(col("trace_id"))
      .agg(max(struct(
        (col("duration_us") * col("class_n") - col("class_sum_us"))
          .as("excess_scaled"),
        col("hop"), col("span_id"), col("service"), col("duration_us"),
        col("class_sum_us"), col("class_n"), col("n_spans"))).as("m"))
      .select(col("trace_id"), col("m.n_spans").as("n_spans"),
        col("m.hop").as("hop"), col("m.span_id").as("span_id"),
        col("m.service").as("service"),
        col("m.duration_us").as("duration_us"),
        (col("m.duration_us").cast("double") -
          col("m.class_sum_us").cast("double") / col("m.class_n"))
          .as("excess_us"))
  }
}
