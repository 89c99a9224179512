package graft.pipeline

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit, TimeoutException}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.transfer.{ConnectionFactory, ConnectionPool}

/** Unit tier: pool behavior with a fake connection, mirroring
  * /root/reference/tests/test_ftp_pool.py:124-263 (reuse, validation,
  * stale replacement, blocking at capacity, timeout, thread stress). */
@graft.tags.Integration
class PoolSpec extends AnyFunSuite {

  private final class FakeConn(val id: Int) { @volatile var alive = true }

  private class FakeFactory extends ConnectionFactory[FakeConn] {
    val createdTotal = new AtomicInteger(0)
    val closedTotal = new AtomicInteger(0)
    def create(): FakeConn = new FakeConn(createdTotal.incrementAndGet())
    def validate(c: FakeConn): Boolean = c.alive
    def close(c: FakeConn): Unit = { c.alive = false; closedTotal.incrementAndGet() }
  }

  test("borrow creates lazily up to poolSize, reuse returns the same connection") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 2, maxWaitSec = 1.0)
    val c1 = pool.borrow()
    pool.give(c1)
    val c2 = pool.borrow()
    assert(c2 eq c1, "returned connection must be reused")
    assert(f.createdTotal.get == 1)
    pool.give(c2)
  }

  test("stale connections are closed and replaced on borrow (pool.py:117-125)") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 1, maxWaitSec = 1.0)
    val c1 = pool.borrow()
    pool.give(c1)
    c1.alive = false // goes stale while idle
    val c2 = pool.borrow()
    assert(c2.id != c1.id, "stale connection must be replaced")
    assert(f.closedTotal.get == 1)
    pool.give(c2)
  }

  test("at capacity, borrow blocks until a connection is returned (pool.py:139-154)") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 1, maxWaitSec = 5.0)
    val c1 = pool.borrow()
    val got = new CountDownLatch(1)
    new Thread(() => { val c = pool.borrow(); got.countDown(); pool.give(c) }).start()
    assert(!got.await(200, TimeUnit.MILLISECONDS), "borrow must block while exhausted")
    pool.give(c1)
    assert(got.await(2, TimeUnit.SECONDS), "borrow must wake on return")
  }

  test("exhausted pool times out with TimeoutException (pool.py:156-160)") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 1, maxWaitSec = 0.2)
    val c1 = pool.borrow()
    val e = intercept[TimeoutException](pool.borrow())
    assert(e.getMessage.contains("Timeout waiting for connection"))
    pool.give(c1)
  }

  test("failed create frees the capacity slot") {
    val f = new FakeFactory {
      var fail = true
      override def create(): FakeConn =
        if (fail) throw new java.io.IOException("connect refused") else super.create()
    }
    val pool = new ConnectionPool[FakeConn](f, poolSize = 1, maxWaitSec = 0.2)
    intercept[java.io.IOException](pool.borrow())
    f.fail = false
    val c = pool.borrow() // slot must not be leaked by the failed attempt
    assert(c != null)
    pool.give(c)
  }

  test("closeAll closes idle connections; pool unusable after (pool.py:243-257)") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 2, maxWaitSec = 1.0)
    val c1 = pool.borrow(); val c2 = pool.borrow()
    pool.give(c1); pool.give(c2)
    pool.closeAll()
    assert(f.closedTotal.get == 2)
    intercept[IllegalStateException](pool.borrow())
  }

  test("4-thread stress: connections never exceed poolSize (test_ftp_pool.py:124-263)") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 2, maxWaitSec = 10.0)
    val inUse = new AtomicInteger(0)
    val maxInUse = new AtomicInteger(0)
    val ex = Executors.newFixedThreadPool(4)
    val errors = new AtomicInteger(0)
    (1 to 100).foreach { _ =>
      ex.submit(new Runnable {
        def run(): Unit =
          try pool.withConnection { _ =>
            val n = inUse.incrementAndGet()
            maxInUse.updateAndGet(m => math.max(m, n))
            Thread.sleep(1)
            inUse.decrementAndGet()
          } catch { case _: Throwable => errors.incrementAndGet() }
      })
    }
    ex.shutdown()
    assert(ex.awaitTermination(30, TimeUnit.SECONDS))
    assert(errors.get == 0)
    assert(maxInUse.get <= 2, s"max concurrent connections ${maxInUse.get} exceeded poolSize")
    assert(f.createdTotal.get <= 2 + f.closedTotal.get)
  }

  test("idle timeout is stored but NOT enforced by default (config.py:43-44 parity)") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 1, maxWaitSec = 1.0,
      idleTimeoutSec = 0.05) // enforcement defaults OFF
    val c1 = pool.borrow(); pool.give(c1)
    Thread.sleep(150) // far past the timeout
    pool.evictIdle() // even an explicit sweep is a no-op without the flag
    val c2 = pool.borrow()
    assert(c2 eq c1, "without FTP_POOL_IDLE_ENFORCE the connection must survive idling")
    assert(f.closedTotal.get == 0)
    pool.give(c2)
    pool.closeAll()
  }

  test("FTP_POOL_IDLE_ENFORCE: aged idle connections are closed, slots freed") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 2, maxWaitSec = 1.0,
      idleTimeoutSec = 0.05, enforceIdleTimeout = true)
    val c1 = pool.borrow(); pool.give(c1)
    Thread.sleep(150)
    pool.evictIdle() // deterministic sweep (the daemon does the same on a timer)
    assert(f.closedTotal.get == 1, "the aged idle connection must be closed")
    assert(pool.created == 0, "eviction must free the capacity slot")
    val c2 = pool.borrow()
    assert(c2.id != c1.id, "a post-eviction borrow gets a fresh connection")
    pool.give(c2)
    pool.closeAll() // also stops the sweeper daemon
  }

  test("idle enforcement: the background sweeper evicts without a borrow") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 1, maxWaitSec = 1.0,
      idleTimeoutSec = 0.05, enforceIdleTimeout = true)
    val c1 = pool.borrow(); pool.give(c1)
    val deadline = System.nanoTime() + 3_000_000_000L
    while (f.closedTotal.get == 0 && System.nanoTime() < deadline) Thread.sleep(10)
    assert(f.closedTotal.get == 1, "the daemon sweeper must evict the aged connection")
    assert(pool.idleCount == 0)
    pool.closeAll()
  }

  test("idle enforcement never touches in-use or freshly-returned connections") {
    val f = new FakeFactory
    val pool = new ConnectionPool[FakeConn](f, poolSize = 2, maxWaitSec = 1.0,
      idleTimeoutSec = 0.1, enforceIdleTimeout = true)
    val held = pool.borrow() // in use for the whole test
    Thread.sleep(200)
    pool.evictIdle()
    assert(f.closedTotal.get == 0, "an in-use connection must never be evicted")
    pool.give(held) // returning re-ages it
    pool.evictIdle()
    assert(f.closedTotal.get == 0, "a freshly-returned connection is not yet aged")
    val again = pool.borrow()
    assert(again eq held)
    pool.give(again)
    pool.closeAll()
  }

  test("closeAll racing concurrent give never leaks a connection") {
    // give() offers under the pool lock after checking `closed`, so every
    // connection ends up closed exactly once — whether it was drained from
    // the idle queue by closeAll or rejected-and-discarded by a late give.
    (1 to 25).foreach { _ =>
      val f = new FakeFactory
      val pool = new ConnectionPool[FakeConn](f, poolSize = 4, maxWaitSec = 5.0)
      val conns = (1 to 4).map(_ => pool.borrow())
      val start = new CountDownLatch(1)
      val ex = Executors.newFixedThreadPool(5)
      conns.foreach { c =>
        ex.submit(new Runnable {
          def run(): Unit = { start.await(); pool.give(c) }
        })
      }
      ex.submit(new Runnable {
        def run(): Unit = { start.await(); pool.closeAll() }
      })
      start.countDown()
      ex.shutdown()
      assert(ex.awaitTermination(10, TimeUnit.SECONDS))
      // no second closeAll: under the fix every give either parked BEFORE
      // the drain (closeAll closes it) or saw closed=true and discarded —
      // an unclosed connection here is exactly the pre-fix leak
      assert(f.closedTotal.get == f.createdTotal.get,
        s"leak: created ${f.createdTotal.get}, closed ${f.closedTotal.get}")
    }
  }
}
