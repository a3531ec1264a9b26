package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.codec.{BigEndianInt32, Codecs}
import graft.model.{Header, RawRecord}
import graft.ops.ContextOps
import graft.sources.KafkaIO

/** S1-S3 sink contract, broker-free: the exact bytes [[KafkaIO
  * .toSinkShape]] hands to the Kafka producer (key / big-endian value /
  * headers) must re-decode through [[ContextOps.decode]] to the record
  * that was sent — the byte-level round-trip the reference exercises
  * against a live broker (reference: StreamsConfigTest.java:52-67;
  * serdes application.yml:17-21). No broker exists in this sandbox, so
  * this pins the serialization contract the connector would carry. */
class KafkaContractSpec extends SparkSpec {
  import spark.implicits._

  private def be(i: Int): Array[Byte] =
    Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
      ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)

  private val traceId = "00000000000000aa"
  private val parentSpan = "00000000000000bb"

  test("sink bytes round-trip: key, big-endian value, b3 + baggage headers") {
    val sent = RawRecord("k-1".getBytes("UTF-8"), be(42), "numbers", 0, 7L,
      new Timestamp(1700000000007L), 0,
      Seq(Header("x-custom", "keep-me".getBytes("UTF-8")),
        Header("b3", s"$traceId-$parentSpan-1".getBytes("UTF-8"))))
    val decoded = ContextOps.setBaggage(ContextOps.decode(Seq(sent).toDF()))
    val sink = KafkaIO.toSinkShape(ContextOps.encodeHeaders(decoded), "even-numbers")

    // wire shape: binary key, exactly the serde's 4 big-endian bytes
    val wire = sink.select(col("topic"), col("key"), col("value")).head()
    assert(wire.getString(0) === "even-numbers")
    assert(new String(wire.getAs[Array[Byte]](1), "UTF-8") === "k-1")
    assert(wire.getAs[Array[Byte]](2).toSeq === be(42).toSeq)

    // re-ingest as the downstream consumer sees it (the broker assigns
    // partition/offset/timestamp on delivery)
    val redelivered = sink
      .withColumn("partition", lit(0))
      .withColumn("offset", lit(99L))
      .withColumn("timestamp", lit(new Timestamp(1700000000100L)))
      .withColumn("timestampType", lit(0))
    val back = ContextOps.decode(redelivered)
    val r = back.select(col("key"), col("value_int"), col("trace_id"),
      col("parent_id"), col("sampled")).head()
    assert(r.getString(0) === "k-1")
    assert(r.getInt(1) === 42)
    assert(r.getString(2) === traceId, "trace id propagates across the hop")
    // the span minted on send becomes the parent of the next hop
    val sentSpan = decoded.select(col("span_id")).as[String].head()
    assert(r.getString(3) === sentSpan)
    assert(r.getBoolean(4))

    // headers: custom header preserved byte-exact, baggage appended
    val hdr = back.select(
      Codecs.headerLast(col("headers"), "x-custom").cast("string"),
      Codecs.headerLast(col("headers"), "messageid").cast("string")).head()
    assert(hdr.getString(0) === "keep-me")
    assert(hdr.getString(1) === "messageid_42")
  }

  test("big-endian int encode/decode round-trips edge values byte-exact") {
    val vals = Seq(0, 1, -1, 42, 256, -256, Int.MaxValue, Int.MinValue)
    val df = vals.toDF("v")
      .withColumn("enc", BigEndianInt32.beIntEncode(col("v")))
      .withColumn("dec", BigEndianInt32.beInt(col("enc")))
    val rows = df.select(col("v"), col("enc"), col("dec"))
      .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1).toSeq, r.getInt(2)))
    rows.foreach { case (v, enc, dec) =>
      assert(enc === be(v).toSeq, s"wire bytes for $v must match the Kafka IntegerSerializer")
      assert(dec === v, s"decode(encode($v)) must round-trip")
    }
  }

  test("production id minting is random per row and per hop") {
    val n = 1000L
    val ids = spark.range(n)
      .withColumn("a", Codecs.mintSpanIdRandom())
      .withColumn("b", Codecs.mintSpanIdRandom())
    val agg = ids.select(
      countDistinct(col("a")).as("da"),
      count(when(col("a") === col("b"), 1)).as("collisions"),
      count(when(col("a").rlike("^[0-9a-f]{16}$"), 1)).as("wellformed")).head()
    assert(agg.getLong(0) === n, "ids must be distinct across rows")
    assert(agg.getLong(1) === 0L, "two mints in one hop must differ")
    assert(agg.getLong(2) === n, "ids must be 16 lowercase hex chars")
    // oracle-registry path stays deterministic: prodIds is opt-in
    val det = ContextOps.setBaggage(
      Seq(RawRecord("k".getBytes, be(2), "numbers", 0, 1L,
        new Timestamp(1700000000001L), 0, Seq.empty)).toDF()
        .transform(ContextOps.decode))
    val det2 = ContextOps.setBaggage(
      Seq(RawRecord("k".getBytes, be(2), "numbers", 0, 1L,
        new Timestamp(1700000000001L), 0, Seq.empty)).toDF()
        .transform(ContextOps.decode))
    assert(det.select(col("span_id")).as[String].head() ===
      det2.select(col("span_id")).as[String].head())
    // prod mode: same record, different ids per run
    val p1 = ContextOps.setBaggage(det.drop("messageid", "span_id"), prodIds = true)
      .select(col("span_id")).as[String].head()
    val p2 = ContextOps.setBaggage(det.drop("messageid", "span_id"), prodIds = true)
      .select(col("span_id")).as[String].head()
    assert(p1 !== p2, "production mints must be random per evaluation")
  }
}
