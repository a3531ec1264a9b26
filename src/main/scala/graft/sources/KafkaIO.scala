package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink wiring (S1-S3 in SURVEY.md §2.1).
  *
  * The record shape these produce/consume is exactly
  * [[graft.model.Schemas.rawRecord]] — the same schema the
  * MemoryStream-based tests and [[graft.streaming.Pipeline]] run on,
  * so the pipeline is broker-agnostic: swap `MemoryStream.toDF` for
  * [[readStream]] and nothing else changes. (No broker exists in this
  * environment; the wiring compiles against the bundled
  * spark-sql-kafka connector and is exercised end-to-end through the
  * MemoryStream twin.)
  *
  * Reference: topic layout numbers/even-numbers/odd-numbers
  * (docker-compose.yml:17), String key / big-endian-Integer value
  * serdes (application.yml:17-21), headers carrying b3 + baggage
  * (StreamsConfigTest.java:64,111).
  */
object KafkaIO {

  /** Streaming source: subscribe with headers, earliest offsets. */
  def readStream(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("includeHeaders", "true")
      .option("startingOffsets", "earliest")
      .load()

  /** Batch source over a topic (the reference's test-consumer role). */
  def read(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("includeHeaders", "true")
      .load()

  /** Project a decoded+encoded record frame to the Kafka sink shape
    * (key/value binary + headers) for `topic`. */
  def toSinkShape(df: DataFrame, topic: String): DataFrame =
    df.select(
      col("key").cast("binary").as("key"),
      col("value"),
      col("headers"),
      lit(topic).as("topic"))

  /** Batch sink write (used from foreachBatch — one producer pool per
    * executor, batched+compressed like the reference's producer,
    * TestProducer.java:20-26). */
  def write(df: DataFrame, bootstrap: String, topic: String): Unit =
    toSinkShape(df, topic).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("kafka.compression.type", "gzip")
      .option("kafka.batch.size", "16384")
      .save()

  /** A [[graft.streaming.Pipeline.Sink]] backed by a Kafka topic. */
  def sink(bootstrap: String, topic: String): (Long, DataFrame) => Unit =
    (_, df) => write(df, bootstrap, topic)
}
