package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** PlanCache carries every cached corpus artifact (postings,
  * signatures, candidate pairs, KPI models, the LSH index), so its
  * contract — build once per key, MRU-bounded, evictions released —
  * gets its own spec.
  */
class PlanCacheSpec extends AnyFunSuite {
  import TestSpark._

  private def frame(tag: Int): DataFrame = {
    import spark.implicits._
    Seq(tag).toDF("x")
  }

  test("second lookup returns the cached frame without rebuilding") {
    val cache = new PlanCache()
    var builds = 0
    def get() = cache.getOrBuild(spark, "k1") { builds += 1; frame(1) }
    val a = get()
    val b = get()
    assert(builds == 1)
    assert(a eq b, "cache must return the SAME frame instance")
  }

  test("bound evicts least-recently-USED entry and releases it") {
    var evicted = List.empty[DataFrame]
    val cache = new PlanCache(bound = 2, onEvict = df => evicted ::= df)
    val f1 = cache.getOrBuild(spark, "d1")(frame(1))
    cache.getOrBuild(spark, "d2")(frame(2))
    // touch d1 so d2 becomes the LRU entry
    cache.getOrBuild(spark, "d1")(fail("d1 must be cached"))
    val f3 = cache.getOrBuild(spark, "d3")(frame(3))
    assert(evicted.size == 1, "exactly one eviction at bound 2")
    // d1 was refreshed by the hit, so d2 must be the evicted one
    assert(!evicted.contains(f1) && !evicted.contains(f3))
    // d1 and d3 still cached; d2 would rebuild
    cache.getOrBuild(spark, "d1")(fail("d1 must still be cached"))
    cache.getOrBuild(spark, "d3")(fail("d3 must still be cached"))
    var rebuilt = false
    cache.getOrBuild(spark, "d2") { rebuilt = true; frame(2) }
    assert(rebuilt, "evicted d2 must rebuild")
  }

  test("concurrent first callers: one frame wins, the loser is released") {
    var released = List.empty[DataFrame]
    val cacheR = new PlanCache(onEvict = df => released ::= df)
    val gate = new java.util.concurrent.CountDownLatch(1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fs = (1 to 4).map(i => Future {
      gate.await()
      cacheR.getOrBuild(spark, "race")(frame(i))
    })
    gate.countDown()
    val results = fs.map(Await.result(_, 30.seconds))
    assert(results.toSet.size == 1, "every caller must see ONE winning frame")
    // losers (duplicate builds) must have been released, never leaked
    assert(!released.contains(results.head))
  }
}
