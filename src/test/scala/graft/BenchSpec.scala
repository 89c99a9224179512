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

  test("suspect triggers: >2x floor always fires; 1.5-2x band needs GC or excess") {
    val fl = Some(1.0)
    // healthy slot: under 1.5x, never a suspect even with heavy GC
    assert(!Bench.isSuspect(1.4, 10000, fl))
    // (b) the r11 tightening: anything past 2x floor fires, zero GC
    assert(Bench.isSuspect(2.01, 0, fl))
    // the 1.5-2x band needs a second signal:
    assert(!Bench.isSuspect(1.8, 0, fl)) // low GC, <2s excess → clean
    assert(Bench.isSuspect(1.8, 200, fl)) // (a) GC >=10% of 1.8s wall
    assert(Bench.isSuspect(9.0, 0, Some(5.0))) // (c) 1.8x but 4s excess
    // (d) no floor → always adjudicate (first-appearance seeding)
    assert(Bench.isSuspect(0.1, 0, None))
    // failed queries (-1) are never suspects
    assert(!Bench.isSuspect(-1.0, 0, fl) && !Bench.isSuspect(-1.0, 0, None))
  }

  test("headline merge: best of suite/iso, failed iso never wins") {
    assert(Bench.headline(3.0, Some(1.2)) == 1.2) // iso cleans the slot
    assert(Bench.headline(1.2, Some(3.0)) == 1.2) // suite already best
    assert(Bench.headline(3.0, None) == 3.0) // no probe → suite stands
    assert(Bench.headline(3.0, Some(-1.0)) == 3.0) // failed iso ignored
    assert(Bench.headline(-1.0, Some(1.0)) == -1.0) // suite failure stays loud
  }
}
