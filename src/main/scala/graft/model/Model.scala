package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Schemas (SURVEY.md §1.4): correlation context is ordinary columns —
  * `trace_id`, `span_id`, `parent_id`, `sampled`, baggage — so every
  * built-in operator propagates it by construction. No thread-local
  * state exists anywhere in the engine.
  */

/** Kafka-source-shaped raw record (mirrors the Structured Streaming
  * Kafka source schema with includeHeaders=true). */
case class RawRecord(
    key: Array[Byte],
    value: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: Timestamp,
    timestampType: Int,
    headers: Seq[Header])

case class Header(key: String, value: Array[Byte])

/** Decoded + context-enriched record — the engine's working currency.
  * Reference analog: a Kafka Streams record plus its ambient Brave
  * trace context (reference: StreamsConfig.java:30-37), made explicit. */
case class EnrichedRecord(
    key: String,
    value_int: Int,
    topic: String,
    partition: Int,
    offset: Long,
    ts: Timestamp,
    trace_id: String,
    span_id: String,
    parent_id: String,
    sampled: Boolean,
    messageid: String)

/** A tracing span (reference: the Brave span surface visible in
  * KafkaStreamsLogCorrelationApplication.java:20-32 + README.adoc:103-108). */
case class Span(
    trace_id: String,
    span_id: String,
    parent_id: String,
    sampled: Boolean,
    name: String,
    local_service: String,
    remote_service_name: String,
    kafka_topic: String,
    cause: String,
    ts: Timestamp)

/** A structured log record: what the reference emits as an MDC-decorated
  * text line ([app,traceId,spanId,exportable] — README.adoc:93-114)
  * becomes a row whose context columns are nullable: untraced peeks log
  * with null context (README.adoc:95-96, the odd-branch `peek`). */
case class LogRecord(
    ts: Timestamp,
    level: String,
    logger: String,
    line: String,
    trace_id: String,
    span_id: String,
    messageid: String)

/** Multimodal asset: opaque binary payload + typed metadata
  * (north-star multimodal columns; payload decode is stubbed — see
  * graft.ext.Multimodal). */
case class MediaAsset(
    asset_id: Long,
    media_type: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    byte_len: Long,
    width: Int,
    height: Int,
    sample_rate: Int,
    duration_ms: Long)

object Schemas {
  val header: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", BinaryType)))

  /** The Kafka source schema (includeHeaders=true). */
  val rawRecord: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(header))))
}
