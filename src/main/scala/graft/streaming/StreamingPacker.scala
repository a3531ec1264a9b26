package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.ext.TextOps.packSequences]]: stateful
  * bucket-fill. Each bucket (the same doc_id/bucketWidth partitioning
  * the batch packer cumsums over) keeps ONE long of state — how many
  * tokens it has packed so far — and every arriving document is
  * assigned its bucket-local token offset and 2048-token-chunk id as
  * it lands, across micro-batches.
  *
  * Offsets are bucket-LOCAL by design: the batch packer's global
  * `tok_start` adds a per-bucket base that is a prefix-sum over ALL
  * buckets — a quantity only known when the corpus is complete, which
  * a stream never is. Production materialization composes this
  * stream's (bucket, local_start) with the same one-broadcast-row
  * bucket-base join the batch packer uses, so the streaming operator
  * stays pure per-key state: no global barrier, state = one long per
  * bucket, shuffle = the groupByKey on bucket.
  *
  * Determinism / batch equivalence: within a micro-batch a bucket's
  * rows are packed in doc_id order (sorted below — the iterator order
  * off the shuffle is not contractual), so replaying a corpus in
  * doc_id order per bucket reproduces the batch packer's bucket-local
  * offsets exactly, regardless of how the replay is sliced into
  * micro-batches (StreamingTraceAssemblySpec pins this). The
  * cross-batch half of that precondition is ENFORCED, not merely
  * documented: each bucket's state tracks the last packed docId, and
  * a later micro-batch delivering a smaller docId fails the query
  * loudly — silent offset divergence from the batch packer is the one
  * failure mode a replay harness cannot detect downstream. */
object StreamingPacker {

  case class DocSize(docId: Long, bucket: Long, nTok: Long)
  case class PackedDoc(docId: Long, bucket: Long, nTok: Long,
      localStart: Long, chunkId: Long)

  def packSequences(docs: Dataset[DocSize], chunkTokens: Long): Dataset[PackedDoc] = {
    implicit val outEnc = Encoders.product[PackedDoc]
    implicit val keyEnc = Encoders.scalaLong
    docs.groupByKey(_.bucket)
      .transformWithState(new PackProcessor(chunkTokens), TimeMode.None(),
        OutputMode.Append())
  }

  private class PackProcessor(chunkTokens: Long)
      extends StatefulProcessor[Long, DocSize, PackedDoc] {
    @transient private var filled: ValueState[Long] = _
    @transient private var lastDoc: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      filled = getHandle.getValueState[Long]("filled", Encoders.scalaLong,
        TTLConfig.NONE)
      lastDoc = getHandle.getValueState[Long]("lastDoc", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[DocSize],
        tv: TimerValues): Iterator[PackedDoc] = {
      var off = if (filled.exists()) filled.get() else 0L
      // per-key per-micro-batch buffer: bounded by the batch slice,
      // never the stream
      val sorted = rows.toSeq.sortBy(_.docId)
      if (lastDoc.exists() && sorted.nonEmpty && sorted.head.docId <= lastDoc.get())
        throw new IllegalStateException(
          s"bucket $key: docId ${sorted.head.docId} arrived after " +
            s"${lastDoc.get()} was already packed — replay must deliver each " +
            "bucket in doc_id order across micro-batches, or its offsets " +
            "silently diverge from the batch packer")
      val out = sorted.map { d =>
        val start = off
        off += d.nTok
        PackedDoc(d.docId, key, d.nTok, start, start / chunkTokens)
      }
      filled.update(off)
      sorted.lastOption.foreach(d => lastDoc.update(d.docId))
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[PackedDoc] = Iterator.empty
  }
}
