package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.functions.VectorDot

/** The native codegen'd dot product must be indistinguishable from the
  * composed HOF fold — bit-exact doubles, same null poisoning — since
  * every ANN oracle was written against the composed semantics. The
  * shared session disables codegen fallback, so these runs fail loudly
  * if doGenCode emits bad Java. */
class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private def dvec(xs: Double*) = xs.toArray

  test("native dot is bit-identical to the composed HOF fold on the fixture corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("v", Similarity.asDouble(col("embedding")))
    // self-join a small slice so real double accumulation orders meet
    val pairs = emb.filter(col("vec_id") < 40).as("a")
      .crossJoin(emb.filter(col("vec_id") < 40).as("b"))
    val diff = pairs.select(
        VectorDot.vecDot(col("a.v"), col("b.v")).as("fast"),
        Similarity.dotComposed(col("a.v"), col("b.v")).as("slow"))
      .filter(!(col("fast") === col("slow")) &&
        !(isnan(col("fast")) && isnan(col("slow"))))
      .count()
    assert(diff === 0L, "native and composed dot products must agree bit-for-bit")
  }

  test("null contract matches zip_with padding: mismatch, null element, null array") {
    val rows = Seq(
      (1L, dvec(1, 2, 3), dvec(4, 5, 6)),   // plain: 32.0
      (2L, dvec(1, 2), dvec(4, 5, 6)),      // length mismatch -> null
      (3L, null, dvec(1, 2, 3))             // null array -> null
    ).toDF("id", "a", "b")
    val got = rows.select(col("id"), VectorDot.vecDot(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(32.0))
    assert(got(2L) === None)
    assert(got(3L) === None)

    val withNullElem = spark.sql(
      "SELECT CAST(array(1.0, NULL, 3.0) AS ARRAY<DOUBLE>) AS a, array(1.0d, 2.0d, 3.0d) AS b")
    GraftExtensions.registerAll(spark)
    assert(withNullElem.selectExpr("vec_dot(a, b)").head().isNullAt(0),
      "a null element must poison the sum, like the HOF composition")
  }

  test("vec_dot and vec_l2sq are available as SQL functions") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r === 11.0)
    val l2 = spark.sql("SELECT vec_l2sq(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(l2 === 8.0)
  }

  test("native L2 matches the composed fold bit-for-bit on the fixture corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("v", Similarity.asDouble(col("embedding")))
    val pairs = emb.filter(col("vec_id") < 30).as("a")
      .crossJoin(emb.filter(col("vec_id") < 30).as("b"))
    val composed = aggregate(
      zip_with(col("a.v"), col("b.v"), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)
    val diff = pairs.select(
        graft.functions.VectorL2Sq.vecL2Sq(col("a.v"), col("b.v")).as("fast"),
        composed.as("slow"))
      .filter(!(col("fast") === col("slow")) &&
        !(isnan(col("fast")) && isnan(col("slow"))))
      .count()
    assert(diff === 0L)
  }
}
