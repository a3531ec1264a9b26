package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextRankFixed.textrankFixed

/** Pins for the fused per-document TextRank iterate: bit-for-bit the
  * unrolled join+aggregate form it replaced — that unroll is what the
  * DuckDB oracle recomputes for t_textrank_doc. */
class TextRankFixedSpec extends SparkSpec {

  /** Symmetric degree-annotated per-doc edge frame from undirected
    * weighted pairs. */
  private def edgeFrame(pairs: Seq[(Long, String, String, Long)]): DataFrame = {
    import spark.implicits._
    val und = pairs.toDF("doc_id", "a", "b", "w")
    val e = und.select(col("doc_id"), col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(und.select(col("doc_id"), col("b").as("src"), col("a").as("dst"), col("w")))
    e.join(e.groupBy("doc_id", "src").agg(sum("w").as("wout")), Seq("doc_id", "src"))
  }

  /** The unrolled reference iterate (the pre-r12 t_textrank_doc
    * shape). */
  private def unrolled(e2: DataFrame, iters: Int): DataFrame = {
    var pr = e2.select(col("doc_id"), col("src").as("t")).distinct()
      .select(col("doc_id"), col("t"), lit(1000000L).as("p"))
    for (_ <- 1 to iters) {
      pr = e2.join(pr.withColumnRenamed("t", "src"), Seq("doc_id", "src"))
        .groupBy(col("doc_id"), col("dst").as("t"))
        .agg(sum(expr("(p * w) div wout")).as("c"))
        .select(col("doc_id"), col("t"), expr("150000 + (85 * c) div 100").as("p"))
    }
    pr
  }

  private def fused(e2: DataFrame, iters: Int): DataFrame =
    e2.groupBy("doc_id")
      .agg(collect_list(struct(col("src"), col("dst"), col("w"), col("wout"))).as("edges"))
      .select(col("doc_id"), explode(textrankFixed(col("edges"), iters)).as("r"))
      .select(col("doc_id"), col("r.token").as("t"), col("r.p").as("p"))

  test("matches the unrolled join+aggregate iterate on multi-doc graphs") {
    import spark.implicits._
    // doc 1: a 3-clique with uneven weights; doc 2: a path (degree
    // skew); doc 3: two disconnected dumbbell pairs in one doc
    val pairs = Seq(
      (1L, "a", "b", 3L), (1L, "b", "c", 1L), (1L, "a", "c", 2L),
      (2L, "x", "y", 1L), (2L, "y", "z", 5L),
      (3L, "p", "q", 2L), (3L, "r", "s", 7L))
    val e2 = edgeFrame(pairs).localCheckpoint()
    for (iters <- Seq(1, 4)) {
      val got = fused(e2, iters).as[(Long, String, Long)].collect().sorted.toSeq
      val want = unrolled(e2, iters).as[(Long, String, Long)].collect().sorted.toSeq
      assert(got === want, s"divergence at iters=$iters")
    }
  }

  test("ranks are edge-order independent and hubs outrank leaves") {
    import spark.implicits._
    val pairs = Seq(
      (9L, "hub", "l1", 1L), (9L, "hub", "l2", 1L),
      (9L, "hub", "l3", 1L), (9L, "l1", "l2", 1L))
    val fwd = fused(edgeFrame(pairs), 4)
      .as[(Long, String, Long)].collect().sorted.toSeq
    val rev = fused(edgeFrame(pairs.reverse), 4)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(fwd === rev, "edge order leaked into the fixed point")
    val byTok = fwd.map { case (_, t, p) => t -> p }.toMap
    assert(byTok("hub") > byTok("l3"), s"hub must outrank a leaf: $byTok")
  }

  test("null edge array stays null; empty array yields no tokens") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq(("a", "b", 1L, 1L), ("b", "a", 1L, 1L)))),
        (2L, Some(Seq.empty[(String, String, Long, Long)])),
        (3L, Option.empty[Seq[(String, String, Long, Long)]]))
      .toDF("doc_id", "raw")
      .select(col("doc_id"), when(col("raw").isNotNull,
        transform(col("raw"), e => struct(e.getField("_1").as("src"),
          e.getField("_2").as("dst"), e.getField("_3").as("w"),
          e.getField("_4").as("wout")))).as("edges"))
    val got = df.select(col("doc_id"), textrankFixed(col("edges"), 4).as("r"))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[Any](1).length === 2)
    assert(got(1).getSeq[Any](1).isEmpty)
    assert(got(2).isNullAt(1))
  }

  test("a null edge struct or field fails loudly, never a silent corrupt rank") {
    import spark.implicits._
    // null STRUCT inside the array
    val nullStruct = Seq((1L, Seq(Option(("a", "b", 1L, 1L)), Option.empty[(String, String, Long, Long)])))
      .toDF("doc_id", "raw")
      .select(transform(col("raw"), e => when(e.isNotNull,
        struct(e.getField("_1").as("src"), e.getField("_2").as("dst"),
          e.getField("_3").as("w"), e.getField("_4").as("wout")))).as("edges"))
    val e1 = intercept[Exception] {
      nullStruct.select(textrankFixed(col("edges"), 4)).collect()
    }
    assert(e1.getMessage.contains("null edge struct") ||
      Option(e1.getCause).exists(_.getMessage.contains("null edge struct")),
      s"expected the loud null-struct contract error, got: ${e1.getMessage}")
    // null FIELD inside a struct
    val nullField = Seq((1L, Seq(("a", "b", 1L)))).toDF("doc_id", "raw")
      .select(transform(col("raw"), e => struct(e.getField("_1").as("src"),
        e.getField("_2").as("dst"), e.getField("_3").as("w"),
        lit(null).cast("long").as("wout"))).as("edges"))
    val e2 = intercept[Exception] {
      nullField.select(textrankFixed(col("edges"), 4)).collect()
    }
    assert(e2.getMessage.contains("null field in edge struct") ||
      Option(e2.getCause).exists(_.getMessage.contains("null field in edge struct")),
      s"expected the loud null-field contract error, got: ${e2.getMessage}")
  }
}
