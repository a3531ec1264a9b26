package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Self-scaled scaling probe (the round-13 verdict's task 6): the
  * harness caps fixtures at sf0.1, so the 100 TB claims for the most
  * expensive rows rest on plan shape alone. This tool unions the
  * sf0.1 inputs K× with key offsets into /tmp substrates (the
  * ProbeIterate precedent — a measurement harness, NOT a registry or
  * bench change) and measures the top rows at 1×/3×/10×, so the
  * scaling EXPONENT becomes a recorded number instead of an argument.
  *
  * Substrate design:
  *  - orders/lineitem: every key column (o_orderkey, o_custkey,
  *    l_orderkey, l_suppkey) offset by copy×10⁸ — copy k is a
  *    disconnected replica of the purchase graph, so vertices and
  *    edges both scale ×K with the degree distribution unchanged
  *    (the shape 10× more tenants would produce, not 10× hotter
  *    hubs — hot-key behavior is the skew family's covered claim).
  *  - documents: doc_id offset ×10⁸ AND the text salted with a
  *    per-copy token — without the salt every cross-copy document
  *    pair is an EXACT duplicate and the near-dup pair count grows
  *    ×K² by construction of the data (not of the algorithm), which
  *    would measure the substrate, not the scaling.
  *
  * Protocol (the bench variance memory): per scale, each query runs
  * once UNTIMED (builds its PlanCache substrates — the prepare
  * attribution rule — and warms JIT), then 2 timed reps; compare
  * MINs. Landmark caveat: g_harmonic's 64-seed ball lives in one
  * replica, so its state grows with ball size, not corpus size — the
  * measured exponent is the real behavior of the query as written
  * over a ×K corpus.
  *
  * Usage: runMain graft.tools.Probe10x [sfDir] [scales] [reps]
  *        (defaults /root/testdata/sf0.1, "1,3,10", 2)
  */
object Probe10x {

  private val Off = 100000000L

  private def scaled(s: SparkSession, base: String, out: String, k: Int): Unit = {
    val dir = new java.io.File(out)
    // the marker embeds (base, k): a rerun against a DIFFERENT base dir
    // or scale must rebuild, not silently reuse a substrate derived
    // from the old corpus (ADVICE r14 — the PlanCache.persisted
    // fingerprint discipline)
    val marker = new java.io.File(dir, "_built")
    val want = s"$base|$k"
    val have =
      try new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
      catch { case _: Throwable => "" }
    if (have == want) return
    dir.mkdirs()
    def copies(df: DataFrame, f: (DataFrame, Long) => DataFrame): DataFrame =
      (0 until k).map(i => f(df, i.toLong * Off)).reduce(_ unionAll _)
    val ord = s.read.parquet(s"$base/orders.parquet")
    copies(ord, (d, o) => d
      .withColumn("o_orderkey", col("o_orderkey") + o)
      .withColumn("o_custkey", col("o_custkey") + o))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")
    val li = s.read.parquet(s"$base/lineitem.parquet")
    copies(li, (d, o) => d
      .withColumn("l_orderkey", col("l_orderkey") + o)
      .withColumn("l_suppkey", col("l_suppkey") + o)
      .withColumn("l_partkey", col("l_partkey") + o))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
    val doc = s.read.parquet(s"$base/documents.parquet")
    copies(doc, (d, o) => d
      .withColumn("doc_id", col("doc_id") + o)
      .withColumn("text", concat(col("text"), lit(" zcopy"), lit(o / Off))))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    // supplier rides along UNREPLICATED: it only seeds the landmark
    // queries (nation-0 suppliers, ≤64 by the bfsHopsPerSeed gate) and
    // its original keys address replica 0 — the documented landmark
    // caveat (ball size scales, seed count must not)
    s.read.parquet(s"$base/supplier.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/supplier.parquet")
    java.nio.file.Files.write(marker.toPath, want.getBytes("UTF-8"))
    ()
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.graft.spreadSmallInputs", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.quietKnownWarns()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val queries = Seq("g_pagerank", "g_hits", "g_harmonic", "g_cheapest_path",
      "a_bootstrap_ci", "d_span_apply", "d_lsh_jaccard")

    scales.foreach { k =>
      val dir = s"/tmp/probe10x/x$k"
      val tb = timed(scaled(spark, base, dir, k))
      println(f"[probe10x] x$k substrate ready (${tb}%.1fs)")
      queries.foreach { name =>
        spark.sparkContext.setJobDescription(s"probe10x x$k $name")
        val fn = graft.SparkEntry.queries(name)
        // untimed warm pass: substrate builds land here (the prepare
        // attribution rule), JIT warms
        val warm = timed(noop(fn(spark, dir)))
        val times = (1 to reps).map(_ => timed(noop(fn(spark, dir))))
        println(f"[probe10x] x$k $name%-16s warm=${warm}%7.2fs " +
          times.map(t => f"$t%7.2f").mkString("reps=[", ",", "]s") +
          f" min=${times.min}%7.2f")
      }
    }
    spark.stop()
  }
}
