package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanShape

/** The plan-shape regression gate — the oracle gate's missing twin
  * (VERDICT r10 item 2). Values are guarded query-by-query by the DuckDB
  * compare; this suite guards the PLANS: every batch query's physical
  * signature (exchanges, join strategies, filters, scans+pushdown,
  * codegen spans, array-carrying shuffles, global sorts) is diffed
  * against the committed PLANS.json. A plan change — intended or not —
  * fails the suite until acknowledged by regenerating the file:
  *
  *   sbt "runMain graft.tools.PlanSnapshot"        # all
  *   sbt "runMain graft.tools.PlanSnapshot q41"    # one entry
  *
  * This converts past plan wins (q41/q83 skinny candidates, q316's
  * checkpoint discipline, every broadcast decision) into permanent
  * invariants instead of ~a dozen bespoke assertions.
  */
class PlanShapeSpec extends AnyFunSuite {

  // a FRESH session for conf isolation, plus an explicit cache clear:
  // a plan's shape depends on which persisted frames are live in the
  // CacheManager (a cached subtree collapses to an InMemoryRelation
  // leaf), and the CacheManager lives in SHARED state — per context,
  // not per session — so 28 prior suites' leftovers reshaped 8 plans in
  // round 11's full-suite run. catalog.clearCache() + newSession()'s
  // empty (session, dir)-keyed artifact memos reproduce exactly the
  // state the PlanSnapshot generator's fresh JVM sees; both sides then
  // iterate the same sorted names from the same empty state, so
  // intra-run path dependence cancels. The cache is cleared again
  // afterwards so this test's own leftovers can't reshape the plan
  // assertions of suites that run later (ScaleSpec's).
  private lazy val spark = SparkSpec.spark.newSession()
  private val dir = "/root/testdata/sf0.001"

  test("every q* physical plan matches its committed PLANS.json signature") {
    val file = Paths.get("PLANS.json")
    assert(Files.exists(file),
      "PLANS.json missing — generate it: sbt \"runMain graft.tools.PlanSnapshot\"")
    val expected = PlanShape.parsePlans(Files.readString(file))
    val names = PlanShape.gateNames
    val missing = names.filterNot(expected.contains)
    val orphans = expected.keySet.diff(names.toSet)
    assert(missing.isEmpty,
      s"queries with no committed plan signature (run PlanSnapshot): " +
        missing.mkString(", "))
    assert(orphans.isEmpty,
      s"PLANS.json entries with no matching query: ${orphans.mkString(", ")}")
    spark.catalog.clearCache()
    val failures =
      try PlanShape.snapshot(spark, dir, names).flatMap {
        case (n, Left(e)) => Some(s"$n: plan build FAILED: $e")
        case (n, Right(sig)) if expected(n) != sig =>
          Some(s"$n: plan shape changed\n    committed: ${expected(n)}\n" +
            s"    actual:    $sig\n    — if intended, acknowledge with: " +
            s"""sbt "runMain graft.tools.PlanSnapshot ${n.takeWhile(_ != '_')}"""")
        case _ => None
      } finally spark.catalog.clearCache()
    assert(failures.isEmpty,
      s"\n${failures.size} un-acknowledged plan change(s):\n" +
        failures.mkString("\n"))
  }

  test("every s*/p* drains+post signature matches its committed PLANS.json entry") {
    // VERDICT r12 item 3: the 67 streaming plans (watermark placement,
    // stateful-operator set, the sentinel-filter discipline) and 7
    // pipeline plans were unguarded. Executing the query at sf0.001
    // captures each drain's PRE-DRAIN analyzed signature plus the
    // returned post-drain physical signature; both diff against the
    // committed file exactly like the q gate above.
    val file = Paths.get("PLANS.json")
    assert(Files.exists(file),
      "PLANS.json missing — generate it: sbt \"runMain graft.tools.PlanSnapshot\"")
    val expected = PlanShape.parseSpPlans(Files.readString(file))
    val names = PlanShape.spGateNames
    val missing = names.filterNot(expected.contains)
    val orphans = expected.keySet.diff(names.toSet)
    assert(missing.isEmpty,
      s"s/p queries with no committed plan signature (run PlanSnapshot): " +
        missing.mkString(", "))
    assert(orphans.isEmpty,
      s"PLANS.json s/p entries with no matching query: ${orphans.mkString(", ")}")
    spark.catalog.clearCache()
    val failures =
      try PlanShape.spSnapshot(spark, dir, names).flatMap {
        case (n, Left(e)) => Some(s"$n: plan build FAILED: $e")
        case (n, Right(sig)) if expected(n) != sig =>
          Some(s"$n: plan shape changed\n    committed: ${expected(n)}\n" +
            s"    actual:    $sig\n    — if intended, acknowledge with: " +
            s"""sbt "runMain graft.tools.PlanSnapshot ${n.takeWhile(_ != '_')}"""")
        case _ => None
      } finally spark.catalog.clearCache()
    assert(failures.isEmpty,
      s"\n${failures.size} un-acknowledged s/p plan change(s):\n" +
        failures.mkString("\n"))
  }

  test("the streaming gate fires on a dropped watermark and a lost sentinel filter") {
    import graft.tools.StreamSig
    val tmp = Files.createTempDirectory("graft_plan_sig")
    spark.range(10)
      .select(col("id"), current_timestamp().as("ts"))
      .write.mode("overwrite").parquet(tmp.resolve("t").toString)
    val schema = spark.read.parquet(tmp.resolve("t").toString).schema
    val src = spark.readStream.schema(schema).parquet(tmp.resolve("t").toString)
    // dropped watermark → the wm dimension carries the difference (the
    // regression class where state retention flips to forever)
    val withWm = src.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).count()
    val noWm = src.groupBy(window(col("ts"), "1 hour")).count()
    val a = StreamSig.of(withWm, "Complete")
    val b = StreamSig.of(noWm, "Complete")
    assert(a.wm == 1 && b.wm == 0 && a.agg >= 1 && a != b,
      s"wm must differ: $a vs $b")
    // lost sentinel filter (the uid < 0 drop the verify skill documents)
    // → the filter dimension carries the difference
    val guarded = StreamSig.of(src.filter(col("id") >= 0), "Append")
    val bare = StreamSig.of(src, "Append")
    assert(guarded.filter == bare.filter + 1 && guarded != bare)
    // both read one streaming source
    assert(a.src == 1 && guarded.src == 1)
    // a mode flip alone also fails the diff (Complete vs Append holds
    // windows open very differently at 100 TB)
    assert(StreamSig.of(withWm, "Append") != a)
  }

  test("the gate fires on an injected regression: a dropped pruning filter") {
    // the q41/q83 class: remove the candidate length filter and the
    // signature must differ — proving the committed entry (filter count
    // included) would fail the diff above
    import spark.implicits._
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      // spark.range, not a local Seq: ConvertToLocalRelation folds a
      // filter over a LocalRelation away at optimize time and no
      // FilterExec would ever appear
      val cand = spark.range(100).select(
        col("id").as("id_a"), (col("id") + 1).as("id_b"),
        (col("id") % 10 + 1).as("na"), (col("id") % 7 + 1).as("nb"))
      val base = cand.groupBy("id_a", "id_b").count()
      val pruned = cand
        .filter(col("nb") * 5 >= col("na") * 3 && col("na") * 5 >= col("nb") * 3)
        .groupBy("id_a", "id_b").count()
      val sigBase = PlanShape.of(base)
      val sigPruned = PlanShape.of(pruned)
      assert(sigBase != sigPruned,
        "removing a pruning filter must change the plan signature")
      assert(sigPruned.filter == sigBase.filter + 1,
        "the filter dimension must carry the difference")
    } finally spark.conf.set(key, before)
  }

  test("the gate fires on a join-strategy flip and an array-fattened shuffle") {
    import spark.implicits._
    val aqe = "spark.sql.adaptive.enabled"
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val aqe0 = spark.conf.get(aqe)
    val thr0 = spark.conf.get(thr)
    spark.conf.set(aqe, "false")
    try {
      val big = spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      val dim = Seq((0L, "x"), (1L, "y")).toDF("k", "v")
      spark.conf.set(thr, (10 * 1024 * 1024).toString)
      val bhj = PlanShape.of(big.join(dim, "k"))
      spark.conf.set(thr, "-1")
      val smj = PlanShape.of(big.join(dim, "k"))
      assert(bhj.bhj == 1 && bhj.smj == 0)
      assert(smj.bhj == 0 && (smj.smj + smj.shj) == 1,
        s"threshold -1 must force a shuffle-side join, got $smj")
      assert(bhj != smj, "a join-strategy flip must change the signature")

      // the q41/q83 fat-exchange class: shuffling the array column vs
      // shuffling bare keys and rejoining by id
      val docs = Seq((1L, Seq("a", "b")), (2L, Seq("c", "d")))
        .toDF("id", "arr")
      val fat = docs.repartition(col("id")).groupBy("id")
        .agg(first("arr").as("arr"))
      val skinny = docs.select("id").repartition(col("id"))
        .groupBy("id").count()
      assert(PlanShape.of(fat).arrayExchange >= 1,
        "an array column riding a shuffle must be counted")
      assert(PlanShape.of(skinny).arrayExchange == 0)
    } finally {
      spark.conf.set(thr, thr0)
      spark.conf.set(aqe, aqe0)
    }
  }
}
