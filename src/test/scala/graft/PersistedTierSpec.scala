package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Contract pins for the parquet-backed substrate tier
  * ([[graft.ops.PlanCache.persisted]]): a second session must reuse
  * the stored bytes without rebuilding, changed sources must rebuild
  * (the loud staleness check), and the in-session memoization must
  * not mask either behavior. */
class PersistedTierSpec extends SparkSpec {
  import spark.implicits._

  test("a second session reuses the substrate byte-identically; changed sources rebuild") {
    val root = java.nio.file.Files.createTempDirectory("graft_persist_").toString
    val srcDir = s"$root/src.parquet"
    Seq((1L, "aa"), (2L, "bb"), (3L, "aa")).toDF("doc_id", "text")
      .write.parquet(srcDir)

    var builds = 0
    def substrate(s: SparkSession): DataFrame =
      graft.ops.PlanCache.persisted(s"$root/tier", "test_substrate",
          graft.ops.PlanCache.sourceFingerprint(Seq(srcDir)), s, "doc_id", 2) {
        builds += 1
        s.read.parquet(srcDir).withColumn("h", md5(col("text")))
      }

    val first = substrate(spark).collect().map(_.toString).sorted.toSeq
    assert(builds === 1 && first.size === 3)
    val storedFp = graft.ops.PlanCache.sourceFingerprint(Seq(s"$root/tier/test_substrate"))

    // same session: memoized, no rebuild, no re-read decision
    substrate(spark)
    assert(builds === 1)

    // "second driver": a fresh session (distinct PlanCache identity)
    // must serve the STORED bytes — build must not run again, the
    // stored files must be untouched, rows identical
    val s2 = spark.newSession()
    val second = substrate(s2).collect().map(_.toString).sorted.toSeq
    assert(builds === 1, "a second session must reuse the persisted substrate, not rebuild")
    assert(second === first, "stored substrate must serve identical rows")
    assert(graft.ops.PlanCache.sourceFingerprint(Seq(s"$root/tier/test_substrate")) === storedFp,
      "the reuse path must not rewrite the stored files")

    // staleness: the source gains a row -> fingerprint changes -> a
    // fresh session must REBUILD (never silently serve stale bytes)
    Seq((4L, "cc")).toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val third = substrate(spark.newSession()).collect().map(_.toString).sorted.toSeq
    assert(builds === 2, "changed sources must trigger a rebuild")
    assert(third.size === 4, s"rebuilt substrate must reflect the new source: $third")

    // and the rebuilt substrate is itself reusable
    val fourth = substrate(spark.newSession()).collect().map(_.toString).sorted.toSeq
    assert(builds === 2 && fourth === third)
  }

  test("two sessions racing a cold substrate build it once (writer exclusion)") {
    val root = java.nio.file.Files.createTempDirectory("graft_persist_").toString
    val srcDir = s"$root/src.parquet"
    Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text").write.parquet(srcDir)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def substrate(s: SparkSession): DataFrame =
      graft.ops.PlanCache.persisted(s"$root/tier", "race",
          graft.ops.PlanCache.sourceFingerprint(Seq(srcDir)), s, "doc_id", 1) {
        builds.incrementAndGet()
        Thread.sleep(500) // widen the race window
        s.read.parquet(srcDir)
      }
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(2)
    try {
      val futs = Seq(spark.newSession(), spark.newSession()).map { s =>
        pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          def call(): Seq[String] =
            substrate(s).collect().map(_.toString).sorted.toSeq
        })
      }
      val results = futs.map(_.get())
      assert(results(0) === results(1) && results(0).size === 2)
      assert(builds.get() === 1,
        "the second racer must block on the build lock, re-check the sidecar " +
          "and REUSE — a double build overwrites files mid-scan")
    } finally pool.shutdown()
  }

  test("a missing sidecar is stale, never trusted") {
    val root = java.nio.file.Files.createTempDirectory("graft_persist_").toString
    val srcDir = s"$root/src.parquet"
    Seq((1L, "x")).toDF("doc_id", "text").write.parquet(srcDir)
    var builds = 0
    def substrate(s: SparkSession): DataFrame =
      graft.ops.PlanCache.persisted(s"$root/tier", "nosidecar",
          graft.ops.PlanCache.sourceFingerprint(Seq(srcDir)), s, "doc_id", 1) {
        builds += 1; s.read.parquet(srcDir)
      }
    substrate(spark)
    assert(builds === 1)
    // simulate a crash between data write and sidecar write
    assert(new java.io.File(s"$root/tier/nosidecar.fingerprint").delete())
    substrate(spark.newSession())
    assert(builds === 2, "a substrate directory without its sidecar must rebuild")
  }
}
