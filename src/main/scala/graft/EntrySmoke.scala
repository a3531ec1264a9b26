package graft

import org.apache.spark.sql.SparkSession

/** Reproduces the driver's smoke check: a plain default session (no
  * graft-specific configs) calling SparkEntry.entry — guards against
  * accidentally depending on session settings only our own mains set. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[entry-smoke] rows=$n schema=${df.schema.map(_.name).mkString(",")}")
    assert(n > 0, "entry() must return rows on sf0.001")
    spark.stop()
  }
}
