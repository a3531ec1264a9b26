package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.ops.PlanCache

/** The overlapped prepare phase (Bench, round 14) races many threads
  * at the SAME registry-shared substrates. PlanCache entries must
  * build exactly once under that contention: a duplicated
  * localCheckpoint build re-runs the whole job and persists a second
  * copy nothing reads, and a duplicated persist() double-registers the
  * plan with the CacheManager. These pins hold the lazy-holder
  * contract the parallel prepare relies on. */
class PlanCacheConcurrencySpec extends SparkSpec {

  test("concurrent cachedBy calls on one key run the build exactly once") {
    val builds = new AtomicInteger(0)
    val nThreads = 8
    val ready = new CountDownLatch(nThreads)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nThreads)
    val spk = spark
    val futs = (1 to nThreads).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          ready.countDown(); go.await()
          val df = PlanCache.cachedBy("spec-conc-once", 0xC0FFEE, spk) {
            builds.incrementAndGet()
            spk.range(1000L).select(col("id"), (col("id") * 2).as("v"))
          }
          df.count()
        }
      })
    }
    ready.await(30, TimeUnit.SECONDS)
    go.countDown()
    val counts = futs.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(counts.forall(_ == 1000L))
    assert(builds.get() == 1,
      s"build thunk ran ${builds.get()} times under an 8-thread race; must be exactly once")
  }

  test("concurrent checkpointed calls share one materialized frame") {
    val builds = new AtomicInteger(0)
    val nThreads = 6
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nThreads)
    val spk = spark
    val futs = (1 to nThreads).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          go.await()
          PlanCache.checkpointed("spec-conc-ck", 0xBEEF, spk) {
            builds.incrementAndGet()
            spk.range(500L).select(col("id"))
          }.count()
        }
      })
    }
    go.countDown()
    val counts = futs.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(counts.forall(_ == 500L))
    assert(builds.get() == 1)
  }

  test("a failed build is retried by the next caller, not cached") {
    val attempts = new AtomicInteger(0)
    val spk = spark
    intercept[RuntimeException] {
      PlanCache.cachedBy("spec-conc-fail", 0xDEAD, spk) {
        attempts.incrementAndGet()
        throw new RuntimeException("boom")
      }
    }
    // second call re-runs the thunk (lazy val failure does not settle)
    val df = PlanCache.cachedBy("spec-conc-fail", 0xDEAD, spk) {
      attempts.incrementAndGet()
      spk.range(10L).toDF("id")
    }
    assert(df.count() == 10L)
    assert(attempts.get() == 2)
  }
}
