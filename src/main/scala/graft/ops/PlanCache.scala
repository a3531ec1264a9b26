package graft.ops

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialized-intermediate registry. A self-join or a family of
  * queries over the same derived frame (e.g. the shingle-hash index
  * shared by Jaccard/MinHash/LSH) would otherwise re-evaluate the
  * whole derivation per subtree occurrence — Catalyst does not do
  * cross-subtree common-plan elimination. Keyed by the logical plan's
  * semantic hash, so two structurally-equal derivations share one
  * persisted copy.
  *
  * Scale note: on a cluster this is the "staging table" step — at
  * 100 TB the same call site writes a bucketed intermediate instead of
  * MEMORY_AND_DISK; the query shape above it is unchanged. */
object PlanCache {
  private val cache = TrieMap.empty[(Int, String), DataFrame]

  def cached(tag: String, df: DataFrame): DataFrame = {
    val key = (df.queryExecution.logical.semanticHash(), tag)
    cache.getOrElseUpdate(key, df.persist(StorageLevel.MEMORY_AND_DISK))
  }

  def clear(): Unit = {
    cache.values.foreach(_.unpersist())
    cache.clear()
  }
}
