package graft.pipeline.transfer

import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, TimeUnit, TimeoutException}

import graft.pipeline.{PipelineConfig, ServerConfig}

/** Thread-safe bounded connection pool.
  *
  * Scala counterpart of the reference's FTPConnectionPool
  * (/root/reference/src/etl/transfer/pool.py:44-257), generic over the
  * connection type so behavior is unit-testable without a live server:
  *
  *  - borrow (pool.py:88-160): try to reuse an idle connection; validate
  *    it (NOOP probe, pool.py:212-227); a stale one is closed, its slot
  *    freed, and the borrow retried; if under capacity, create a new
  *    connection (capped by createdCount under lock); otherwise block up
  *    to maxWait for a return → TimeoutException;
  *  - return (pool.py:162-182): offered back to the queue AS-IS —
  *    neither we nor the reference validate on return; staleness is
  *    caught by the next borrow's probe. If the pool is closed or full
  *    the connection is closed instead;
  *  - closeAll (pool.py:243-257): drains and closes everything. Return
  *    and closeAll synchronize on the pool lock so a connection given
  *    back concurrently with shutdown is either drained-and-closed or
  *    rejected-and-closed — never parked in a closed pool's queue.
  *
  * The reference's idle timeout is *stored but never enforced* (no
  * eviction loop exists — config.py:41-44); we replicate that: the value
  * is carried in config and intentionally unused.
  *
  * On Spark this lives as a per-executor JVM singleton (see
  * [[FtpPools]]): tasks on the same executor share pooled connections
  * across micro-batches, the reference's pool-per-process model mapped to
  * pool-per-executor.
  */
trait ConnectionFactory[C] extends Serializable {
  def create(): C
  def validate(conn: C): Boolean
  def close(conn: C): Unit
}

final class ConnectionPool[C](
    factory: ConnectionFactory[C],
    poolSize: Int,
    maxWaitSec: Double) {

  private val idle = new ArrayBlockingQueue[C](poolSize)
  private val lock = new Object
  private var createdCount = 0
  @volatile private var closed = false

  def created: Int = lock.synchronized(createdCount)
  def idleCount: Int = idle.size()

  /** pool.py:88-160 */
  @annotation.tailrec
  def borrow(): C = {
    if (closed) throw new IllegalStateException("Pool is closed")
    idle.poll() match {
      case conn if conn != null =>
        if (factory.validate(conn)) conn
        else { // stale: close, free the slot, retry (pool.py:117-125)
          discard(conn)
          borrow()
        }
      case _ =>
        val fresh = lock.synchronized {
          if (createdCount < poolSize) { createdCount += 1; true } else false
        }
        if (fresh) {
          try factory.create()
          catch { case e: Throwable => lock.synchronized(createdCount -= 1); throw e }
        } else {
          // at capacity: block for a return (pool.py:139-160)
          val conn = idle.poll((maxWaitSec * 1000).toLong, TimeUnit.MILLISECONDS)
          if (conn == null)
            throw new TimeoutException(
              s"Timeout waiting for connection from pool (waited ${maxWaitSec}s)")
          if (factory.validate(conn)) conn
          else { discard(conn); borrow() }
        }
    }
  }

  /** pool.py:162-182 — closed-check and offer are one atomic step under
    * the lock, so a return racing closeAll can't park a connection in a
    * queue that was already drained (it gets discarded instead). */
  def give(conn: C): Unit = {
    val returned = lock.synchronized(!closed && idle.offer(conn))
    if (!returned) discard(conn)
  }

  private def discard(conn: C): Unit = {
    try factory.close(conn) catch { case _: Throwable => () }
    lock.synchronized(createdCount -= 1)
  }

  def withConnection[A](f: C => A): A = {
    val c = borrow()
    try f(c)
    finally give(c)
  }

  /** pool.py:243-257 — decrements createdCount per drained connection
    * (not a blanket reset): connections still borrowed keep their slots
    * accounted and are closed at their own give(), keeping the count
    * consistent instead of letting late returns drive it negative. */
  def closeAll(): Unit = lock.synchronized {
    closed = true
    var c = idle.poll()
    while (c != null) {
      try factory.close(c) catch { case _: Throwable => () }
      createdCount -= 1
      c = idle.poll()
    }
  }
}

/** Pool-per-server manager — FTPPoolManager (pool.py:260-320).
  *
  * One pool per `host:port:username` key (pool.py:293), JVM-wide (i.e.
  * per Spark executor). Registered as a shutdown hook so executor
  * teardown closes live FTP sessions.
  */
object FtpPools {
  private val pools = new ConcurrentHashMap[String, ConnectionPool[FtpBackend]]()

  private final class FtpFactory(cfg: ServerConfig, passive: Boolean)
      extends ConnectionFactory[FtpBackend] {
    def create(): FtpBackend = {
      val b = new FtpBackend(cfg, passive)
      b.connect()
      b
    }
    def validate(conn: FtpBackend): Boolean = conn.validate()
    def close(conn: FtpBackend): Unit = conn.disconnect()
  }

  def apply(cfg: ServerConfig, pc: PipelineConfig): ConnectionPool[FtpBackend] = {
    val key = s"${cfg.host}:${cfg.port}:${cfg.username}" // pool.py:293
    pools.computeIfAbsent(key, _ =>
      new ConnectionPool[FtpBackend](
        new FtpFactory(cfg, pc.ftpPassiveMode), pc.ftpPoolSize, pc.ftpPoolMaxWaitSec))
  }

  def closeAll(): Unit = {
    import scala.jdk.CollectionConverters._
    pools.values.asScala.foreach(_.closeAll())
    pools.clear()
  }

  sys.addShutdownHook(closeAll())
}
