package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement probe for the top-k-per-group strategy question
  * (STATUS r8 / VERDICT r8 task: does a tiny-key-domain top-k pay for
  * a `fewGroups`-style declared-strategy split the way the exact
  * percentiles did?).
  *
  * Two candidate physical shapes for "top 3 parts per brand"
  * (25 brands — a tiny key domain — over the lineitem join):
  *
  *  A. row_number window: Spark's rank-limit pushdown
  *     (WindowGroupLimit, SPARK-37099) prunes every map partition to
  *     ≤ k rows per key BEFORE the shuffle, so the ≤|keys| reducer
  *     partitions sort k·#mapPartitions rows each — the serial tail a
  *     tiny key domain threatens is bounded by the prune, not by the
  *     data.
  *
  *  B. aggregate of sorted arrays: groupBy(key).agg(slice(
  *     sort_array(collect_list(struct(...)), desc), 1, k)) + explode —
  *     one partial-agg'd shuffle, no window, but the map-side partial
  *     collects EVERY row of its partition into the array buffer
  *     before the final slice (collect_list has no top-k prune), so
  *     the "fewer shuffles" shape actually moves more bytes and burns
  *     partial-agg memory.
  *
  * Run with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS (the Bench envs);
  * prints per-rep seconds. The recorded verdict lives in BASELINE.md
  * ("negative results go in BASELINE.md" — the reverted-PlanCache
  * convention). */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Bench.quietKnownWarns()

    def rev(): DataFrame = {
      val part = spark.read.parquet(s"$sfDir/part.parquet")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }

    def windowForm(): DataFrame =
      rev().withColumn("rnk", row_number().over(
          Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))))
        .filter(col("rnk") <= 3)

    def aggForm(): DataFrame =
      rev().groupBy(col("p_brand"))
        .agg(slice(sort_array(collect_list(struct(
          col("revenue"), (-col("p_partkey")).as("nk"), col("p_partkey"))), asc = false),
          1, 3).as("top"))
        .select(col("p_brand"), explode(col("top")).as("t"))
        .select(col("p_brand"), col("t.p_partkey"), col("t.revenue"))

    def time(label: String, f: () => DataFrame): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f().queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$label rep$rep: $dt%.3f s ($n rows)")
      }
    }

    // warmup both plans once (JIT + parquet footers)
    windowForm().queryExecution.toRdd.count()
    aggForm().queryExecution.toRdd.count()
    time("window(WindowGroupLimit)", windowForm _)
    time("agg(sorted-array slice) ", aggForm _)
    spark.stop()
  }
}
