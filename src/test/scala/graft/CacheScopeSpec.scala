package graft

import org.apache.spark.storage.StorageLevel

import graft.operators.CacheScope

/** [[CacheScope]] — scoped pins release via the handle; orphan pins
  * (no scope open) are LRU-bounded so a loop calling a pinning
  * operator without a scope cycles a bounded cache instead of
  * accumulating persists for the session lifetime. Eviction is
  * correctness-safe: an evicted frame recomputes. */
class CacheScopeSpec extends GraftSuite {
  import spark.implicits._

  test("scoped pins release via the handle") {
    val (a, release) = CacheScope.collect {
      CacheScope.pin(Seq(1, 2).toDF("v"))
    }
    assert(a.storageLevel != StorageLevel.NONE)
    release()
    assert(a.storageLevel == StorageLevel.NONE)
  }

  test("orphan pins are LRU-bounded: oldest evicted at the cap, " +
      "newest persisted, evicted frames still compute") {
    val frames = (0 to CacheScope.OrphanCap).map(i =>
      CacheScope.pin(Seq(i).toDF("v")))
    assert(frames.head.storageLevel == StorageLevel.NONE,
      "oldest orphan must be evicted once the cap is exceeded")
    assert(frames.last.storageLevel != StorageLevel.NONE,
      "newest orphan must stay persisted")
    assert(frames.head.collect().map(_.getInt(0)).toSeq == Seq(0))
    frames.foreach(f => { f.unpersist(); () })
  }
}
