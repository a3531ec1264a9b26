package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("pq_encode is callable from SQL with literal geometry") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql(
      """SELECT pq_encode(array(0.0d, 0.0d, 5.0d, 5.0d),
        |array(array(0.0d, 0.0d, 9.0d, 9.0d), array(7.0d, 7.0d, 5.0d, 5.0d)),
        |2, 2, 2) AS codes""".stripMargin)
      .as[Seq[Int]].head()
    assert(got === Seq(0, 1), "subspace 1 nearest seed 0, subspace 2 nearest seed 1")
    val err = intercept[Exception] {
      spark.sql("SELECT pq_encode(array(0.0d), array(array(0.0d)), 1, 1, cast(1 as bigint))").collect()
    }
    assert(err.getMessage.contains("INT literal"))
  }

  test("the SQL parity pipeline replays the DSL correlation rows exactly") {
    val dir = "/root/testdata/sf0.001"
    val sql = SparkEntry.queries("q_sql_pipeline")(spark, dir)
      .as[(Long, String, String, String)].collect().sorted.toSeq
    val dsl = SparkEntry.queries("q_log_correlation")(spark, dir)
      .select("event_id", "trace_id", "messageid", "line")
      .as[(Long, String, String, String)].collect().sorted.toSeq
    assert(sql.nonEmpty && sql === dsl,
      "parser+FunctionRegistry path diverged from the column DSL")
  }

  test("the SQL interval join replays the DSL bucketed overlap rows exactly") {
    val dir = "/root/testdata/sf0.001"
    val sql = SparkEntry.queries("q_sql_interval")(spark, dir)
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    val dsl = SparkEntry.queries("a_interval_join")(spark, dir)
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(sql.nonEmpty && sql === dsl,
      "parser-path interval join diverged from the DSL operator")
  }

  test("the SQL as-of join replays the DSL union+window rows exactly") {
    val dir = "/root/testdata/sf0.001"
    val sql = SparkEntry.queries("q_sql_asof")(spark, dir)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().sorted.toSeq
    val dsl = SparkEntry.queries("a_asof_join")(spark, dir)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().sorted.toSeq
    assert(sql.nonEmpty && sql === dsl,
      "parser-path as-of join diverged from the DSL operator")
  }

  test("the SQL minhash-LSH pipeline replays the DSL near-dup pairs exactly") {
    val dir = "/root/testdata/sf0.001"
    val sql = SparkEntry.queries("q_sql_lsh")(spark, dir)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val dsl = SparkEntry.queries("d_lsh_jaccard")(spark, dir)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(sql.nonEmpty && sql === dsl,
      "parser-path LSH pipeline diverged from the DSL operator")
  }

  test("the SQL KMV estimate replays the DSL sketch rows exactly") {
    val dir = "/root/testdata/sf0.001"
    val sql = SparkEntry.queries("q_sql_kmv")(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq
    val dsl = SparkEntry.queries("a_daily_distinct_kmv")(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(sql.nonEmpty && sql === dsl,
      "parser-path KMV estimate diverged from the DSL aggregate")
  }

  test("the SQL heavy hitters replay the DSL two-phase rows exactly") {
    val dir = "/root/testdata/sf0.001"
    val sql = SparkEntry.queries("q_sql_heavy")(spark, dir)
      .as[(String, Long)].collect().sorted.toSeq
    val dsl = SparkEntry.queries("t_heavy_hitters")(spark, dir)
      .as[(String, Long)].collect().sorted.toSeq
    assert(sql.nonEmpty && sql === dsl,
      "parser-path heavy hitters diverged from the DSL two-phase form")
  }

  test("minhash_sketch is callable from SQL with a literal width") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql(
      """SELECT g, minhash_sketch(h, 4) AS mh FROM VALUES
        |(1, CAST(100 AS BIGINT)), (1, CAST(7 AS BIGINT)), (2, CAST(NULL AS BIGINT))
        |AS t(g, h) GROUP BY g""".stripMargin)
      .as[(Int, Option[Seq[Long]])].collect().toMap
    // group 1: elementwise min over the two hashes' permutations
    val expect = (0 until 4).map { i =>
      Seq(100L, 7L).map(h => (h * (2L * i + 1) + (10007L * i + 1)) %
        graft.functions.MinHashSketch.P).min
    }
    assert(got(1) === Some(expect))
    assert(got(2) === None, "an all-null group must sketch to null")
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sketch(CAST(1 AS BIGINT), 1 + 3)").collect()
    }
    assert(err.getMessage.contains("INT literal"))
  }

  test("be_int is callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql(
      "SELECT be_int(unhex('0000002A')) AS a, be_int(unhex('FFFFFFFF')) AS b, be_int(unhex('00')) AS c")
      .as[(Int, Int, Option[Int])].head()
    assert(got === ((42, -1, None)))
  }
}
