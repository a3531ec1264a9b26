package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the iterate-family checkpoint cadence (the
  * round-12 verdict's task 3): at what granularity should a bounded
  * mutual-reinforcement unroll materialize?
  *
  * g_hits variants, identical arithmetic (hash-checked):
  *  - perPhase : the shipped shape — every rescale phase eagerly
  *               localCheckpoints its raw scores (8 actions / run).
  *  - k2Fold   : one eager checkpoint per ROUND (the hraw phase);
  *               araw is referenced twice uncheckpointed, so it
  *               computes twice inside the round — halves the serial
  *               actions, doubles the a-phase work.
  *  - lazyCkpt : per-phase NON-EAGER localCheckpoint — the first job
  *               that touches the phase (the 1-row max broadcast)
  *               doubles as its materialization, so the dedicated
  *               checkpoint action disappears with NO double-compute.
  *
  * g_pagerank variants: checkpointEvery = 0 (one deep job, shipped)
  * vs 2 (two power steps per materialization).
  *
  * Protocol (memory: bench variance): interleave variants, 2 reps
  * each, report per-rep times — compare MINs. Verify every variant's
  * rows hash-equal to the shipped shape before trusting any timing.
  */
object ProbeIterate {

  private def hitsEdges(s: SparkSession, dir: String): DataFrame =
    graft.ops.PlanCache.cached("purchase-edges-directed", {
      val li = graft.SparkEntry.T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = graft.SparkEntry.T(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      li.join(ord, "l_orderkey")
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("p"))
        .agg(count(lit(1)).as("w"))
    })

  /** mode: 0 = perPhase (shipped), 1 = k2Fold, 2 = lazyCkpt. */
  private def hits(e: DataFrame, mode: Int): DataFrame = {
    var h = e.select(col("c")).distinct()
      .select(col("c"), lit(1000000L).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to 4) {
      val araw0 = e.join(h, "c").groupBy("p").agg(sum(expr("w * h")).as("ar"))
      val araw = mode match {
        case 0 => araw0.localCheckpoint()
        case 1 => araw0
        case 2 => araw0.localCheckpoint(eager = false)
      }
      a = araw.crossJoin(broadcast(araw.agg(max("ar").as("m"))))
        .select(col("p"), expr("ar * 1000000 div m").as("a"))
      val hraw0 = e.join(a, "p").groupBy("c").agg(sum(expr("w * a")).as("hr"))
      val hraw = mode match {
        case 0 => hraw0.localCheckpoint()
        case 1 => hraw0.localCheckpoint()
        case 2 => hraw0.localCheckpoint(eager = false)
      }
      h = hraw.crossJoin(broadcast(hraw.agg(max("hr").as("m"))))
        .select(col("c"), expr("hr * 1000000 div m").as("h"))
    }
    a.select(concat(lit("s"), col("p").cast("string")).as("node"),
        col("a").as("score_e6"), lit("authority").as("kind"))
      .unionAll(h.select(concat(lit("c"), col("c").cast("string")),
        col("h"), lit("hub")))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.spreadSmallInputs", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.quietKnownWarns()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fingerprint(df: DataFrame): Long =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)

    // ---- g_hits ----
    val e = hitsEdges(spark, dir)
    e.count() // warm the staging frame (the media_fps attribution rule)
    val base = fingerprint(hits(e, 0))
    for (m <- 1 to 2)
      require(fingerprint(hits(e, m)) == base, s"hits mode $m diverged!")
    println("[probe] all hits variants hash-equal")
    val names = Map(0 -> "perPhase", 1 -> "k2Fold  ", 2 -> "lazyCkpt")
    for (rep <- 1 to 2; m <- Seq(0, 1, 2)) {
      val sec = timed(noop(hits(e, m)))
      println(f"[hits ${names(m)}] rep$rep ${sec}%.2fs")
    }

    // ---- g_pagerank ----
    val pe = graft.SparkEntry.T(spark, dir, "lineitem")
    val edges = {
      // the symmetrized purchase edges, same build as the registry row
      val li = pe.select(col("l_orderkey"), col("l_suppkey"))
      val ord = graft.SparkEntry.T(spark, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      graft.ops.PlanCache.cached("purchase-edges", {
        li.join(ord, "l_orderkey")
          .groupBy(col("o_custkey"), col("l_suppkey"))
          .agg(count(lit(1)).as("w"))
          .select(explode(array(
            struct(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
              concat(lit("s"), col("l_suppkey").cast("string")).as("dst"), col("w")),
            struct(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
              concat(lit("c"), col("o_custkey").cast("string")).as("dst"), col("w")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
      })
    }
    graft.ops.Graph.stageStatics(edges)
    val pr0 = fingerprint(graft.ops.Graph.pageRankFixed(edges, 5))
    require(fingerprint(graft.ops.Graph.pageRankFixed(edges, 5, checkpointEvery = 2)) == pr0,
      "pagerank checkpointEvery=2 diverged!")
    println("[probe] pagerank variants hash-equal")
    for (rep <- 1 to 2; ck <- Seq(0, 2)) {
      val sec = timed(noop(graft.ops.Graph.pageRankFixed(edges, 5, checkpointEvery = ck)))
      println(f"[pagerank ckptEvery=$ck] rep$rep ${sec}%.2fs")
    }
    spark.stop()
  }
}
