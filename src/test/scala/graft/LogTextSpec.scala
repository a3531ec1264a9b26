package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.model.LogRecord
import graft.sources.LogText

class LogTextSpec extends SparkSpec {
  import spark.implicits._

  private val traced = LogRecord(new Timestamp(0), "INFO", "StreamsConfig",
    "set messageid for trace-propagation -> 2",
    "53459172072115497126152695641873", "088bcff034578c1a", "messageid_2")
  private val untraced = LogRecord(new Timestamp(0), "INFO", "StreamsConfig",
    "Odd: trace-propagation -> 1", null, null, null)

  test("render emits reference-format lines; untraced lines have empty context") {
    val lines = LogText.render(Seq(traced, untraced).toDF()).as[String].collect().sorted
    assert(lines(0) ===
      "INFO [app,,,] --- [graft] StreamsConfig: Odd: trace-propagation -> 1")
    assert(lines(1) ===
      "INFO [app,53459172072115497126152695641873,088bcff034578c1a,true] --- [graft] StreamsConfig: set messageid for trace-propagation -> 2")
  }

  test("parse round-trips render, mapping empty context back to null") {
    val parsed = LogText.parse(
      LogText.render(Seq(traced, untraced).toDF()))
    val rows = parsed.select("level", "trace_id", "span_id", "sampled", "logger", "line")
      .as[(String, Option[String], Option[String], Option[Boolean], String, String)]
      .collect().sortBy(_._6)
    assert(rows(0) === (("INFO", None, None, None, "StreamsConfig",
      "Odd: trace-propagation -> 1")))
    assert(rows(1) === (("INFO", Some("53459172072115497126152695641873"),
      Some("088bcff034578c1a"), Some(true), "StreamsConfig",
      "set messageid for trace-propagation -> 2")))
  }

  test("garbage lines parse to all-null rows instead of failing the scan") {
    val parsed = LogText.parse(Seq("not a log line at all").toDF("value"))
    assert(parsed.filter(col("level").isNull).count() === 1)
  }

  test("parsed log joins to records by trace_id (the correlation query)") {
    val logs = LogText.parse(LogText.render(Seq(traced, untraced).toDF()))
    val records = Seq(("53459172072115497126152695641873", 2)).toDF("trace_id", "value_int")
    val joined = graft.ops.ContextOps.correlate(
      records, logs.select(col("trace_id"), col("line")))
    assert(joined.count() === 1)
  }
}
