package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantic pins for the Statistics module beyond the value-hash oracle:
  * the map round-trip is lossless, chi-square/diversity/KS land in their
  * mathematical ranges, and KS matches an independent local re-derivation.
  * Runs at sf0.001.
  */
class StatisticsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q163 map round-trip equals the direct relational computation") {
    import spark.implicits._
    val got = run("q163_map_functions")
      .as[(String, Long, Long, Long)].collect().toSet
    val direct = Tables.events(spark, dir)
      .select(col("event_type"), expr("(ts_us div 3600000000) % 24").as("hour"),
        expr("cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("vc"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("cnt"), expr("sum(vc) div count(1)").as("avg_cents"))
      .filter(col("cnt") >= 5)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == direct, "map_from_entries→map_zip_with→map_filter→explode must be lossless")
    assert(got.nonEmpty)
  }

  test("q164 chi-square terms are non-negative and row totals cover the table") {
    import spark.implicits._
    val rows = run("q164_chi_square").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0), "each per-type chi-square contribution is >= 0")
    val total = Tables.events(spark, dir).count()
    assert(rows.map(_._2).sum == total, "row totals must partition the event count")
  }

  test("q165 Simpson diversity lands in [0, 1e6] with sane counts") {
    import spark.implicits._
    val rows = run("q165_simpson_diversity")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nLangs, ppm) =>
      assert(ppm >= 0 && ppm < 1000000, s"$src: ppm=$ppm out of range")
      assert(nLangs >= 1 && nLangs <= nDocs)
      if (nLangs == 1) assert(ppm == 0, s"$src: monoculture must score 0")
    }
  }

  test("q166 KS statistic matches an independent local re-derivation") {
    import spark.implicits._
    val Array((n1, n2, dnum, ppm)) =
      run("q166_ks_test").as[(Long, Long, Long, Long)].collect()
    assert(ppm >= 0 && ppm <= 1000000)
    // local ECDF re-derivation from the raw fixture
    val vals = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(expr("cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        col("event_type"))
      .as[(Long, String)].collect()
    val a = vals.collect { case (v, "view") => v }.sorted
    val b = vals.collect { case (v, "purchase") => v }.sorted
    assert(n1 == a.length && n2 == b.length)
    val expected = (a ++ b).distinct.map { x =>
      val c1 = a.count(_ <= x).toLong
      val c2 = b.count(_ <= x).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    assert(dnum == expected,
      s"distributed prefix-sum ECDF diverged from local KS: $dnum vs $expected")
  }

  test("q167 TVD is in [0, 1e6] and halves partition the table") {
    import spark.implicits._
    val Array((n1, n2, ppm)) =
      run("q167_tvd_drift").as[(Long, Long, Long)].collect()
    assert(ppm >= 0 && ppm <= 1000000)
    assert(n1 + n2 == Tables.events(spark, dir).count())
    assert(math.abs(n1 - n2) < (n1 + n2) / 2, "midpoint split is not degenerate")
  }

  test("q168 Benford shares sum to ~1e6 and digits cover 1-9") {
    import spark.implicits._
    val rows = run("q168_benford_audit")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == (1L to 9L).toSet)
    assert(rows.map(_._4).sum == 1000000L, "pinned Benford constants sum to 1e6")
    val obsSum = rows.map(_._3).sum
    assert(obsSum > 999990 && obsSum <= 1000000,
      s"observed shares sum to $obsSum (floored ppm loses < 9)")
  }

  test("q171 Mann-Whitney U matches a local tie-averaged rank re-derivation") {
    import spark.implicits._
    val Array((n1, n2, u1x2, ppm)) =
      run("q171_mann_whitney").as[(Long, Long, Long, Long)].collect()
    assert(u1x2 >= 0 && u1x2 <= 2 * n1 * n2, "U1 lands in [0, n1*n2]")
    assert(ppm >= 0 && ppm <= 1000000)
    val vals = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(expr("cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        col("event_type"))
      .as[(Long, String)].collect()
    val a = vals.collect { case (v, "view") => v }
    val b = vals.collect { case (v, "purchase") => v }
    val all = (a ++ b).sorted
    // doubled tie-averaged rank of value v: 2*below + ties + 1
    val rankX2 = all.distinct.map { v =>
      v -> (2L * all.count(_ < v) + all.count(_ == v) + 1L)
    }.toMap
    val r1x2 = a.map(rankX2).sum
    assert(u1x2 == r1x2 - a.length.toLong * (a.length + 1),
      "distributed doubled-rank sum diverged from the local one")
  }

  test("q173 persistence score matches a local BigInt re-derivation") {
    import spark.implicits._
    val got = run("q173_autocorrelation")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, ppm) => assert(ppm >= 0 && ppm <= 1000000) }
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.toLong)).toMap
    got.foreach { case (et, nDays, nEvents, ppm) =>
      val xs = daily(et)
      assert(nDays == xs.length && nEvents == xs.sum)
      val n = BigInt(xs.length); val s = BigInt(xs.sum)
      val cent = xs.map(x => n * x - s)
      val num = cent.zip(cent.drop(1)).map { case (a, b) => a * b }.sum
      val den = cent.map(a => a * a).sum
      assert(ppm == ((num + den) * 1000000 / (2 * den)).toLong,
        s"$et: persistence diverged")
    }
  }

  test("q174 runs count matches a local median-binarized scan") {
    import spark.implicits._
    val got = run("q174_runs_test")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3))).toMap
    got.foreach { case (et, nAbove, nBelow, runs, expPpm) =>
      val series = daily(et)
      assert(nAbove + nBelow == series.length)
      // lower median: the ceil(n/2)-th smallest under (x, day) order
      val med = series.map(_._2).zip(series.map(_._1)).sorted
        .apply((series.length + 1) / 2 - 1)._1
      val signs = series.map { case (_, x) => if (x > med) 1 else 0 }
      assert(nAbove == signs.count(_ == 1))
      val expRuns = 1 + signs.zip(signs.drop(1)).count { case (a, b) => a != b }
      assert(runs == expRuns, s"$et: runs diverged")
      assert(expPpm == 1000000L
        + 2 * nAbove * nBelow * 1000000L / (nAbove + nBelow))
      assert(runs >= 1 && runs <= series.length)
    }
  }

  test("s26 streaming drift matches a per-day batch TVD re-derivation") {
    import spark.implicits._
    val got = run("s26_stream_dist_drift")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, ppm) => ppm >= 0 && ppm <= 1000000 })
    // local re-derivation from the raw fixture
    val ev = Tables.events(spark, dir)
      .select(expr("ts_us div 86400000000 * 86400000000"),
        expr("cast(cast(value AS DECIMAL(12,2)) * 100 AS BIGINT) div 5000"))
      .as[(Long, Long)].collect()
    val ref = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nRef = ev.length.toLong
    val expected = ev.groupBy(_._1).map { case (day, rows) =>
      val nDay = rows.length.toLong
      val cells = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val num = ref.map { case (b, r) =>
        math.abs(cells.getOrElse(b, 0L) * nRef - r * nDay)
      }.sum
      (day, nDay, num * 1000000L / (2L * nDay * nRef))
    }.toSeq.sortBy(_._1)
    assert(got == expected, "streaming day histograms diverged from batch TVD")
  }

  test("q183 Mann-Kendall S and tie-corrected variance match a brute-force scan") {
    import spark.implicits._
    val got = run("q183_mann_kendall")
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.nonEmpty)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    for ((t, xs) <- daily) {
      val n = xs.length.toLong
      val s = (for (i <- xs.indices; j <- i + 1 until xs.length)
        yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      val tie = xs.groupBy(identity).values
        .map(g => { val m = g.size.toLong; m * (m - 1) * (2 * m + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie
      assert(got(t) == ((n, s, var18)),
        s"$t: got ${got(t)}, brute force gives (${n}, ${s}, ${var18})")
    }
  }

  test("q184 EWMA forecast matches a brute-force 20-lag dyadic re-derivation") {
    import spark.implicits._
    val got = run("q184_ewma_anomaly")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._4, r._5, r._6)).toMap
    assert(got.nonEmpty)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    for (((t, day), (fnum, wsum, ratio)) <- got) {
      val xs = daily(t)
      val lags = (1 to 20).flatMap(i => xs.get(day - i).map(x => (i, x)))
      val eFnum = lags.map { case (i, x) => x << (20 - i) }.sum
      val eWsum = lags.map { case (i, _) => 1L << (20 - i) }.sum
      assert((fnum, wsum) == ((eFnum, eWsum)), s"($t, $day) forecast parts")
      assert(ratio == xs(day) * eWsum * 1000000L / eFnum, s"($t, $day) ratio")
    }
  }

  test("q199 distributed sequence equals the single-machine sort rank") {
    import spark.implicits._
    val got = run("q199_global_sequence")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got.nonEmpty)
    val expected = Tables.events(spark, dir)
      .select(col("event_id"), col("ts_us")).as[(Long, Long)].collect()
      .sortBy(r => (r._2, r._1)).zipWithIndex
      .collect { case ((id, _), i) if id % 199 == 0 => id -> (i + 1).toLong }
      .toMap
    assert(got == expected,
      "range-partitioned two-pass enumeration diverged from the local sort")
  }
}
