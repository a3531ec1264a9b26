package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. A hot key (one trace id with
  * millions of spans, one user with most events) sends its entire
  * partition to a single reducer; salting splits each key into
  * `factor` sub-buckets — the left (large, skewed) side picks a
  * deterministic salt per row, the right side is replicated `factor`
  * ways, so the hot key's rows spread over `factor` reducers.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; this
  * explicit form is for aggregation-feeding joins and engines-off
  * scenarios, and makes the technique testable. Results are identical
  * to the unsalted join (the salt is join-key-extending, not
  * filtering). Deterministic salt (hash of a per-row column) keeps
  * runs reproducible — no rand().
  */
object SkewJoin {

  /** @param saltBy per-row column on `left` whose hash picks the salt
    *               bucket (use a unique id, NOT the join key) */
  def salted(left: DataFrame, right: DataFrame, key: String,
      factor: Int, saltBy: Column): DataFrame = {
    // null saltBy must still land in a bucket — a null salt would
    // silently drop the row from the inner join
    val l = left.withColumn("_salt",
      pmod(coalesce(graft.codec.Codecs.portableHash(saltBy), lit(0L)), lit(factor.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
