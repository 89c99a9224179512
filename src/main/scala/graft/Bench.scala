package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Measurement notes (VERDICT r01 items 3-4, r02 item 4):
  *  - each query is fully executed via the `noop` sink, not `count()` —
  *    count() lets Catalyst drop global sorts and projections, so it
  *    under-measures real work;
  *  - one untimed warmup query runs first so JVM/Spark session warmup
  *    (codegen, classloading, parquet footer caching) doesn't inflate the
  *    first timed query (r01's q03 "7.87 s" was warmup, not plan cost);
  *  - each query runs SPARK_GRAFT_BENCH_ITERS times (default 2) and
  *    reports the MIN — one-shot timings confound plan cost with
  *    whatever the previous query left behind (r02's "q01 regression"
  *    was 11.9 s after the p06 FTP bulk run but 2.1 s in isolation);
  *    min-of-n isolates the repeatable plan cost;
  *  - per-query GC time is recorded (GarbageCollectorMXBeans collection-
  *    time delta across the query's iterations) and emitted as a `gc` map
  *    so a reader can tell machine contention / heap pressure from a real
  *    plan regression — BENCH_r04 showed every CPU-bound query 1.5–25×
  *    inflated under the full-suite run while isolated re-runs matched
  *    r03, and nothing in the line distinguished the two. Only queries
  *    with >= 100 ms of GC appear (keeps the line inside the driver's
  *    ~2000-char tail capture); `gc_total_ms` always reports the whole
  *    run. A query whose wall time grew while its gc entry is large is
  *    heap pressure, not plan cost — re-measure it in isolation;
  *  - r03 note on q41/q26-class deltas: TrackedCaches now releases each
  *    query's persisted intermediates after its drain, so queries no
  *    longer ride earlier queries' leaked caches (r02's q41 "3.5 s"
  *    reused q26's still-cached shingle sets; ~7 s is its honest
  *    standalone cost, the number a production run would see);
  *  - failures are loud: the query records value -1 and lands in "errors",
  *    never a silently-plausible timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt.max(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      // realistic small-file open cost — see GraftSession.builder
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def drain(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally graft.operators.TrackedCaches.releaseAll()

    // Warmup: a representative join+agg pipeline, untimed.
    try drain("q07_region_nation_revenue")
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime.max(0L)).sum

    var errors = List.empty[String]
    val selected = // optional args restrict the run (local iteration aid)
      if (args.nonEmpty) SparkEntry.queries.keys.toSeq.filter(args.contains).sorted
      else SparkEntry.queries.keys.toSeq.sorted
    val gcStart = gcMillis()
    val results = selected.map { name =>
      val gc0 = gcMillis()
      try {
        val times = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          drain(name)
          (System.nanoTime() - t0) / 1e9
        }
        (name, times.min, gcMillis() - gc0)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          errors ::= name
          (name, -1.0, gcMillis() - gc0)
      }
    }
    // ---- self-adjudication (closes the r4/r5 manual-triage loop) ----
    // BENCH_FLOORS.json records the best-known per-query seconds, flat
    // keys "sf0.1/q01". A query whose time grew >1.5x over its floor AND
    // whose GC burned >=10% of its wall time smells like suite-run heap
    // contention, not plan cost — re-run it once after the suite (post-
    // suite heap, same min-of-iters protocol) and emit BOTH numbers
    // ("q38":4.15,"q38_iso":1.74) so the adjudication is in the line
    // itself. Floors self-maintain: every run lowers them monotonically.
    val sfKey = new java.io.File(sfDir).getName
    // anchored via env when the bench runs outside the repo root —
    // a CWD-relative miss would silently disable adjudication AND
    // write a stray floors file
    val floorsFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_FLOORS", "BENCH_FLOORS.json"))
    val floorRe = """"([^"]+)":([0-9.]+)""".r
    val floors: Map[String, Double] =
      if (!floorsFile.exists) Map.empty
      else {
        val src = scala.io.Source.fromFile(floorsFile)
        try floorRe.findAllMatchIn(src.mkString)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        finally src.close()
      }
    // Two triggers (r6 widened): (a) moderate growth (>1.5x floor) with
    // GC >=10% of wall — the classic heap-contention smell; (b) SEVERE
    // growth (>3x floor) regardless of GC — r6's q107 ran 16x its floor
    // in-suite with low GC (scheduler/cache contention, 5.3 s cold in a
    // fresh JVM) and the GC-gated trigger never re-adjudicated it.
    val suspects = results.filter { case (name, v, g) =>
      v >= 0 && floors.get(s"$sfKey/${name.takeWhile(_ != '_')}")
        .exists(fl => (v > fl * 1.5 && g >= v * 1000 * 0.10) || v > fl * 3.0)
    }.sortBy { case (name, v, _) => // worst ratios first, then cap
      -(v / floors.getOrElse(s"$sfKey/${name.takeWhile(_ != '_')}", v))
    }.take(6) // bound the extra wall time on a badly-contended run
    val isoResults = suspects.map { case (name, _, _) =>
      val t =
        try (1 to iters).map { _ =>
          val t0 = System.nanoTime(); drain(name); (System.nanoTime() - t0) / 1e9
        }.min
        catch { case _: Throwable => -1.0 }
      (name.takeWhile(_ != '_'), t)
    }
    // floors: keep the best of (old floor, this run, isolated re-run)
    val isoMap = isoResults.toMap
    val floorUpdates = results.collect { case (name, v, _) if v >= 0 =>
      val short = name.takeWhile(_ != '_')
      val best = math.min(v, isoMap.get(short).filter(_ >= 0).getOrElse(v))
      val key = s"$sfKey/$short"
      key -> math.min(best, floors.getOrElse(key, Double.MaxValue))
    }

    // Keys are shortened to the qNN/sNN/pNN prefix and times rounded to
    // ms so the whole line stays well inside the driver's 2000-char
    // output-tail capture — r01–r03 emitted full names and the line got
    // truncated, leaving the per-query numbers unparseable driver-side.
    // Locale.ROOT: the f-interpolator honors the JVM default locale and
    // would emit comma decimals (invalid JSON) on e.g. de_DE containers
    // 2 decimals: 10 ms granularity is enough to adjudicate any plan
    // regression, and the saved char-per-query keeps the 92-query line
    // inside the driver's 2000-char tail capture with margin
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.size == shortKeys.size,
      s"bench key prefixes collide: ${shortKeys.diff(shortKeys.distinct).mkString(",")}")
    val qs = (results
      .map { case (k, v, _) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) } ++
      isoResults.map { case (k, v) => "\"" + k + "_iso\":" + fmt(v) })
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val gcTotal = gcMillis() - gcStart
    // top-8 noisiest only: at 91 queries a contended run could otherwise
    // push dozens of ≥100 ms entries and blow the ~1.8 kB line budget
    val gcJson = results
      .collect { case (k, _, g) if g >= 100 => (k.takeWhile(_ != '_'), g) }
      .sortBy(-_._2).take(8).sortBy(_._1)
      .map { case (k, g) => "\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val errJson = errors.sorted
      .map(e => "\"" + e.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"gc":$gcJson,"gc_total_ms":$gcTotal,"errors":$errJson,"sf":"$sfDir"}""")
    try {
      val merged = (floors ++ floorUpdates).toSeq.sorted
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}\n")
      java.nio.file.Files.writeString(floorsFile.toPath, merged)
    } catch {
      case e: Throwable => System.err.println(s"[bench] floor update failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
