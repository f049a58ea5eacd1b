package graft

import org.apache.spark.sql.functions._

/** Stress guard for the refcounted pin registry — the two concurrency bugs
  * it has already had (round 5: plan-identical cache entries swapped under
  * concurrently-executing queries; round-5 ADVICE: a pin/unpin TOCTOU
  * window between the count mutation and the CacheManager mutation, closed
  * by running persist/unpersist inside the refcount map's per-key remapping
  * functions). Every worker here pins a PLAN-IDENTICAL frame, so all
  * threads contend on one canonicalized-plan key — the exact interleaving
  * surface of both bugs. */
class CachingSpec extends SparkSpec {

  test("concurrent scoped pin/release of plan-identical frames stays consistent") {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val tasks = (1 to 8).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            for (_ <- 1 to 25) Caching.scoped {
              // same plan on every thread -> same CacheManager entry and
              // the same refcount key under contention
              val p = Caching.pin(
                spark.range(500).toDF("id").withColumn("y", col("id") % 13))
              // the action must see a consistent (cached or recomputed)
              // frame even while siblings unpin the shared key
              assert(p.filter(col("y") === 0).count() == 39)
            }
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(errs.isEmpty, s"worker failures: ${errs.size} — ${Option(errs.peek())}")
    // every scope released its pins; the last release dropped the entry
    assert(Caching.pinnedCount == 0)
    assert(Caching.liveRefKeys == 0)
  }

  test("nested scopes release inner pins without touching outer ones") {
    Caching.scoped {
      val outer = Caching.pin(spark.range(100).toDF("id"))
      Caching.scoped {
        Caching.pin(spark.range(200).toDF("id"))
        assert(Caching.liveRefKeys == 2)
      }
      // inner scope closed: its pin is gone, the outer pin survives
      assert(Caching.liveRefKeys == 1)
      assert(outer.count() == 100)
    }
    assert(Caching.liveRefKeys == 0 && Caching.pinnedCount == 0)
  }
}
