package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** graft.tools.DataGen (VERDICT r13 item 1) — the seed-deterministic
  * fixture generator the sf1 gate runs on. Pinned here:
  * (1) schema parity: every generated table's schema equals the
  *     driver fixture's (field names, types, nullability ignored) —
  *     the whole 448-query surface reads these frames;
  * (2) determinism: re-generating a table yields byte-identical rows
  *     (pure hash of (seed, table, id, field) — no RNG state);
  * (3) invariants the corpus relies on: doc_id < 100000 (q371
  *     recrawl ids), non-empty exact-dup clusters, src{id%20}
  *     sources, n_chars = length(text), events ts non-decreasing in
  *     event_id, unit-norm embeddings, (l_orderkey, l_linenumber)
  *     non-unique at scale (the fixtures' tiebreak quirk).
  */
class DataGenSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val refDir = "/root/testdata/sf0.001"

  test("schema parity with the driver fixtures, table by table") {
    val sz = DataGen.sizes(0.001)
    val gen = Map(
      "region" -> DataGen.region(spark),
      "nation" -> DataGen.nation(spark),
      "customer" -> DataGen.customer(spark, sz.customer),
      "supplier" -> DataGen.supplier(spark, sz.supplier),
      "part" -> DataGen.part(spark, sz.part),
      "orders" -> DataGen.orders(spark, sz.orders, sz.customer),
      "lineitem" -> DataGen.lineitem(spark, sz.lineitem, sz.orders,
        sz.part, sz.supplier),
      "events" -> DataGen.events(spark, sz.events),
      "documents" -> DataGen.documents(spark, sz.documents),
      "embeddings" -> DataGen.embeddings(spark, sz.embeddings))
    gen.foreach { case (name, df) =>
      val ref = spark.read.parquet(s"$refDir/$name.parquet")
      val got = df.schema.fields.map(f => (f.name, f.dataType.simpleString))
      val want = ref.schema.fields.map(f => (f.name, f.dataType.simpleString))
      assert(got.toSeq == want.toSeq,
        s"$name schema drift:\n got ${got.mkString(", ")}\nwant ${want.mkString(", ")}")
    }
  }

  test("determinism: regeneration is row-identical") {
    // hash every column of two independent plan evaluations — a pure
    // (seed, id, field) derivation cannot differ between runs
    def digest(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*)
        .cast("decimal(38,0)").as("h")) // decimal: ANSI-safe long sum
        .agg(sum("h")).head.getDecimal(0)
    assert(digest(DataGen.documents(spark, 500)) ==
      digest(DataGen.documents(spark, 500)))
    assert(digest(DataGen.lineitem(spark, 2000, 500, 200, 10)) ==
      digest(DataGen.lineitem(spark, 2000, 500, 200, 10)))
    assert(digest(DataGen.embeddings(spark, 100).select("vec_id", "label")) ==
      digest(DataGen.embeddings(spark, 100).select("vec_id", "label")))
  }

  test("documents invariants: id bound, dup clusters, source rule, n_chars") {
    val docs = DataGen.documents(spark, 5000).cache()
    try {
      assert(docs.agg(max("doc_id")).head.getLong(0) < 100000L)
      // the id%625 rule plants deterministic exact-duplicate pairs
      val dupRows = docs.groupBy("text").count().filter(col("count") > 1)
        .agg(coalesce(sum("count"), lit(0L))).head.getLong(0)
      assert(dupRows >= 8, s"dedup corpus needs exact clusters, got $dupRows")
      // but they stay rare — the corpus must not degenerate
      assert(dupRows < 100, s"dup rate degenerated: $dupRows of 5000")
      assert(docs.filter(col("source") =!=
        concat(lit("src"), pmod(col("doc_id"), lit(20)))).count() == 0)
      assert(docs.filter(col("n_chars") =!= length(col("text"))).count() == 0)
      assert(docs.filter(!col("lang").isin("en", "zh", "es", "fr", "de"))
        .count() == 0)
      // word lengths live in the fixtures' 10..100 band
      val wc = docs.select(size(split(col("text"), " ")).as("w"))
        .agg(min("w"), max("w")).head
      assert(wc.getInt(0) >= 10 && wc.getInt(1) <= 100, s"word band: $wc")
    } finally docs.unpersist()
  }

  test("vocab scales past 10k docs (Heaps) but stays 31-word below") {
    def vocabSize(n: Long): Long =
      DataGen.documents(spark, n)
        .select(explode(split(col("text"), " ")).as("w"))
        .agg(countDistinct("w")).head.getLong(0)
    // at ladder scales: the exact 31-word driver vocab
    assert(vocabSize(5000) == 31L)
    // above 10k docs: the 310-word extension (shingle space grows
    // ~1000x, so shingle-bucketed candidate generators stay linear —
    // the fixed-vocab corpus saturated at sf1 and sent every LSH
    // oracle quadratic, the r14 gate's second catch)
    val big = vocabSize(20000)
    assert(big > 250L && big <= 310L, s"scaled vocab: $big")
    // the deterministic dup rule survives the vocab switch
    val dups = DataGen.documents(spark, 20000).groupBy("text").count()
      .filter(col("count") > 1).count()
    assert(dups >= 16, s"dup clusters after vocab scale: $dups")
  }

  test("lexical-diversity seed label stays a mixture at every scale") {
    // the classifier family's seed rule (2·|distinct| ≥ |words|) must
    // split the corpus into two NON-EMPTY classes — an all-diverse
    // corpus empties the bad class and poles every class-conditional
    // mean (q287/q308/s49 divide-by-zero at sf1, r14 gate catch #3)
    for (n <- Seq(500L, 5000L, 20000L)) {
      val frac = DataGen.documents(spark, n)
        .select((size(array_distinct(split(col("text"), " "))) * 2 >=
          size(split(col("text"), " "))).cast("long").as("good"))
        .agg(avg("good")).head.getDouble(0)
      assert(frac > 0.1 && frac < 0.9, s"degenerate label mix at n=$n: $frac")
    }
  }

  test("events ts is non-decreasing in event_id; lineitem keys non-unique") {
    import org.apache.spark.sql.expressions.Window
    val ev = DataGen.events(spark, 10000)
    val disorder = ev.withColumn("prev",
      lag("ts", 1).over(Window.orderBy("event_id")))
      .filter(col("prev") > col("ts")).count()
    assert(disorder == 0, s"$disorder out-of-order event rows")
    // the fixtures' known quirk: duplicated (orderkey, linenumber)
    val li = DataGen.lineitem(spark, 6000, 1500, 200, 10)
    val dupPairs = li.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") > 1).count()
    assert(dupPairs > 0, "expected non-unique (l_orderkey, l_linenumber)")
  }

  test("embeddings are unit-norm 64-d") {
    val e = DataGen.embeddings(spark, 200)
    val bad = e.select(abs(aggregate(col("embedding"), lit(0.0d),
      (a, x) => a + x * x) - 1.0d).as("err"), size(col("embedding")).as("d"))
      .filter(col("err") > 1e-3 || col("d") =!= 64).count()
    assert(bad == 0, s"$bad non-unit or wrong-dim vectors")
  }
}
