package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Mergeable Misra–Gries heavy-hitter summary: at most `m` counters
  * plus the exact stream length. The classic guarantee survives
  * arbitrary merge trees (Agarwal et al., "Mergeable Summaries",
  * PODS'12): after summarizing N items, every item with true
  * frequency > N/(m+1) is present among the counters, and each
  * retained count underestimates truth by at most N/(m+1).
  *
  * This is PHASE 1 of the two-phase exact heavy-hitter query
  * ([[graft.ext.TextOps.heavyHitters]]): per-partition summaries are
  * ≤ m entries each — the only thing that crosses the shuffle — and
  * the merged candidate set is a guaranteed superset of the true
  * heavy hitters, so an exact counting pass restricted to the
  * candidates (a broadcast-sized set) reproduces the exact answer a
  * full |vocabulary|-key shuffle would, at sketch cost. The final
  * HAVING uses integer arithmetic (`cnt·(m+1) > N`), so phase-2
  * output is deterministic no matter which superset the sketch
  * happened to retain.
  *
  * The buffer is an immutable Map (ExpressionEncoder-friendly);
  * within a partition the typed aggregation path keeps it as a JVM
  * object, so per-row cost is one persistent-HAMT update, and the
  * O(m) decrement-all fires only when a full summary meets a novel
  * item — ε-bounded amortized, exactly the textbook account. */
object MisraGries {

  /** `items` = retained counters; `n` = exact count of ALL summarized
    * items (heavy-hitter thresholds are fractions of this). */
  final case class MGSummary(items: Map[String, Long], n: Long)

  /** Candidates + exact stream length, ready for the phase-2 pass. */
  final case class MGResult(candidates: Array[String], n: Long)

  final class MGAgg(m: Int) extends Aggregator[String, MGSummary, MGResult] {
    require(m >= 1, s"capacity must be >= 1, got $m")

    override def zero: MGSummary = MGSummary(Map.empty, 0L)

    override def reduce(b: MGSummary, item: String): MGSummary = {
      val n1 = b.n + 1
      b.items.get(item) match {
        case Some(c) => MGSummary(b.items.updated(item, c + 1), n1)
        case None if b.items.size < m =>
          MGSummary(b.items.updated(item, 1L), n1)
        case None =>
          // full summary, novel item: decrement every counter (the
          // novel item's virtual counter hits 0 and is not stored)
          MGSummary(b.items.collect {
            case (k, c) if c > 1 => (k, c - 1)
          }, n1)
      }
    }

    override def merge(a: MGSummary, b: MGSummary): MGSummary = {
      val sum = b.items.foldLeft(a.items) { case (m0, (k, c)) =>
        m0.updated(k, m0.getOrElse(k, 0L) + c)
      }
      val shrunk =
        if (sum.size <= m) sum
        else {
          // subtract the (m+1)-th largest count from everything and
          // drop the non-positives — the merge rule that preserves
          // the N/(m+1) error bound across arbitrary merge trees
          val d = sum.valuesIterator.toArray.sortBy(-_).apply(m)
          sum.collect { case (k, c) if c > d => (k, c - d) }
        }
      MGSummary(shrunk, a.n + b.n)
    }

    override def finish(b: MGSummary): MGResult =
      MGResult(b.items.keysIterator.toArray.sorted, b.n)

    override def bufferEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
    override def outputEncoder: Encoder[MGResult] = Encoders.product[MGResult]
  }
}
