package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("be_int is callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql(
      "SELECT be_int(unhex('0000002A')) AS a, be_int(unhex('FFFFFFFF')) AS b, be_int(unhex('00')) AS c")
      .as[(Int, Int, Option[Int])].head()
    assert(got === ((42, -1, None)))
  }
}
