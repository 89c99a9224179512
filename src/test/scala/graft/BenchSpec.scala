package graft

import org.apache.spark.storage.{BroadcastBlockId, RDDBlockId, StorageLevel}
import org.scalatest.funsuite.AnyFunSuite

/** Unit tier for the bench harness's cache-event classifier: the full
  * sf0.1 suite runs pressure-free on this box (cache_events = {} is the
  * healthy reading), so the classification logic is proven here against
  * synthetic block events rather than waiting for a contended round to
  * exercise it in production.
  */
class BenchSpec extends AnyFunSuite {

  test("cache-event classifier: add / re-add / spill / evict / non-RDD") {
    val ce = new CacheEvents
    val b0 = RDDBlockId(7, 0)
    // first materialization: an add, not a re-add
    ce.record(b0, StorageLevel.MEMORY_AND_DISK)
    assert(ce.snapshot == ((0L, 0L, 0L)))
    // same block stored again (it was dropped and recomputed) → re-add
    ce.record(b0, StorageLevel.MEMORY_AND_DISK)
    assert(ce.snapshot == ((1L, 0L, 0L)))
    // memory→disk demotion under pressure → spill
    ce.record(RDDBlockId(7, 1), StorageLevel.DISK_ONLY)
    assert(ce.snapshot == ((1L, 1L, 0L)))
    // block dropped entirely (invalid level) → evict
    ce.record(RDDBlockId(7, 2), StorageLevel.NONE)
    assert(ce.snapshot == ((1L, 1L, 1L)))
    // non-RDD blocks (broadcast pieces) never count
    ce.record(BroadcastBlockId(3), StorageLevel.MEMORY_AND_DISK)
    ce.record(BroadcastBlockId(3), StorageLevel.NONE)
    assert(ce.snapshot == ((1L, 1L, 1L)))
    // distinct partitions of one RDD are distinct blocks, not re-adds
    ce.record(RDDBlockId(8, 0), StorageLevel.MEMORY_ONLY)
    ce.record(RDDBlockId(8, 1), StorageLevel.MEMORY_ONLY)
    assert(ce.snapshot == ((1L, 1L, 1L)))
  }
}
