package graft.operators

import java.nio.channels.FileChannel
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Shared staging-dir discipline for queries that rewrite a fixture into
  * a derived layout (hive-partitioned copy, range-clustered copy, a
  * persisted index) under `java.io.tmpdir`.
  *
  * Guarantees (ADVICE r5):
  *  - **content-keyed**: the dir name carries a key derived from the
  *    source fixture's bytes+mtime, so a regenerated driver fixture can
  *    never silently reuse stale staging — it lands in a fresh dir;
  *  - **cross-process safe**: a `FileLock` on the dir (plus an
  *    in-process monitor, since JVM file locks don't nest) serializes
  *    concurrent stagers — a parallel test JVM and a bench JVM can't
  *    interleave Spark writes into the same output;
  *  - **crash safe**: the `_STAGED` marker is placed by atomic move
  *    AFTER staging succeeds, so a half-staged dir is never trusted and
  *    is simply re-staged by the next run.
  */
object Staging {

  private val jvmMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Content key for a fixture file or directory: total bytes + newest
    * mtime of its regular files, base-36. */
  def fixtureKey(path: String): String = {
    import scala.jdk.CollectionConverters._
    val files = Files.walk(Paths.get(path)).iterator().asScala
      .filter(Files.isRegularFile(_)).toSeq
    val size = files.map(Files.size(_)).sum
    val mtime = files.map(f => Files.getLastModifiedTime(f).toMillis)
      .maxOption.getOrElse(0L)
    java.lang.Long.toUnsignedString(size ^ java.lang.Long.rotateLeft(mtime, 21), 36)
  }

  /** Atomically place `marker` (with `content`) via temp + ATOMIC_MOVE;
    * losing a race to another stager is fine — first marker wins. */
  def placeMarker(marker: Path, content: String = ""): Unit = {
    val tmp = marker.resolveSibling(
      s".${marker.getFileName}.tmp-${ProcessHandle.current.pid}")
    Files.writeString(tmp, content)
    try Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: FileAlreadyExistsException => Files.deleteIfExists(tmp) }
  }

  /** Where (`name`, scale-factor of `sfDir`, content of `fixturePath`)
    * stages — pure path computation, no side effects. */
  def dirFor(name: String, sfDir: String, fixturePath: String): Path = {
    val sf = Paths.get(sfDir).getFileName.toString
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_staged", name, s"$sf-${fixtureKey(fixturePath)}")
  }

  /** The staging dir for (`name`, scale-factor of `sfDir`, content of
    * `fixturePath`), running `stage(dir)` at most once per fixture
    * content. `stage` returns the marker payload (e.g. a computed
    * cutoff literal; "" if unused) — read it back with
    * [[markerContent]]. */
  def ensure(name: String, sfDir: String, fixturePath: String)
      (stage: Path => String): Path = {
    val dir = dirFor(name, sfDir, fixturePath)
    val marker = dir.resolve("_STAGED")
    if (Files.exists(marker)) return dir
    val monitor = jvmMonitors.computeIfAbsent(dir.toString, _ => new Object)
    monitor.synchronized {
      if (Files.exists(marker)) return dir
      Files.createDirectories(dir)
      val ch = FileChannel.open(dir.resolve(".lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock() // blocks until a concurrent JVM finishes
        try if (!Files.exists(marker)) placeMarker(marker, stage(dir))
        finally lock.release()
      } finally ch.close()
    }
    dir
  }

  def markerContent(dir: Path): String =
    Files.readString(dir.resolve("_STAGED")).trim
}
