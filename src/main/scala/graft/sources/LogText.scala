package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's log-file surface (S4): the app writes
  * MDC-correlated text lines `LEVEL [app,traceId,spanId,exportable]
  * --- [thread] logger : message` (reference: README.adoc:92-114,
  * logging pattern from spring-cloud-sleuth via application.yml:1-8)
  * and the tests grep it over HTTP (StreamsConfigTest.java:86-87).
  *
  * Here both directions are structured:
  *  - [[render]] projects LogRecord rows to reference-format text
  *    lines (the sink side — `df.write.text`),
  *  - [[parse]] turns a text log back into structured rows so
  *    correlation is an equi-join on trace_id rather than a substring
  *    scan. Untraced lines (`[app,,,]`) parse to null context, exactly
  *    the reference's odd-branch behavior.
  */
object LogText {

  private val lineRe =
    "^(\\w+) \\[([^,\\]]*),([^,\\]]*),([^,\\]]*),?([^\\]]*)\\] --- \\[([^\\]]*)\\] ([^:]*): (.*)$"

  /** LogRecord rows → reference-format text lines. */
  def render(logs: DataFrame, app: String = "app"): DataFrame =
    logs.select(concat(
      col("level"), lit(" [" + app + ","),
      coalesce(col("trace_id"), lit("")), lit(","),
      coalesce(col("span_id"), lit("")), lit(","),
      when(col("trace_id").isNotNull, "true").otherwise(lit("")),
      lit("] --- [graft] "), col("logger"), lit(": "), col("line")).as("value"))

  /** Parse reference-format lines into structured log rows; lines that
    * do not match yield null fields (kept, so nothing is silently
    * dropped — filter on level.isNotNull for strict mode). Pure
    * regexp_extract projections: codegen'd, no UDF, scan-parallel. */
  def parse(lines: DataFrame): DataFrame = {
    val v = col("value")
    def grp(i: Int) = {
      val g = regexp_extract(v, lineRe, i)
      when(length(g) > 0, g)
    }
    lines.select(
      grp(1).as("level"),
      grp(2).as("app"),
      grp(3).as("trace_id"),
      grp(4).as("span_id"),
      grp(5).cast("boolean").as("sampled"),
      grp(6).as("thread"),
      grp(7).as("logger"),
      grp(8).as("line"))
  }

  /** Read a log file/directory as structured rows (batch query side). */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** Streaming twin of [[read]]. */
  def readStream(spark: SparkSession, path: String): DataFrame =
    parse(spark.readStream.text(path))
}
