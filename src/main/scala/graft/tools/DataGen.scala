package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seed-deterministic synthetic fixture generator (VERDICT r13 item 1:
  * "prove the scale claims empirically — build sf1").
  *
  * Emits the same ten-table star schema as the driver fixtures
  * (TESTDATA.md; schemas pinned against /root/testdata/sf0.1 field by
  * field), at any scale factor, WITHOUT touching the read-only driver
  * dirs. Every value is a pure function of (SEED, table, row id,
  * field) via xxhash64 — no RNG state, so the output is byte-stable
  * across partitionings, re-runs, and cluster sizes; exactly the
  * property a 100 TB backfill regenerating a lost shard needs.
  *
  * Scale ladder extrapolates the driver's own:
  * sf0.1 = {customer 150k/10, supplier 10k/10, part 200k/10,
  * orders 1.5M/10, lineitem 6M/10, events 1M/10, documents 50k/10,
  * embeddings 8k/4} — docs/embeddings follow the driver's sub-linear
  * ladder (500→500→5000→…, 500→500→2000→8000 i.e. ×4 per decade).
  *
  * Distributional contracts the query corpus relies on (verified
  * against the sf0.1 fixtures before writing this):
  * - documents: 31-word vocab, 10–100 words/doc, lang ∈ en 42% /
  *   zh es fr de ~14.5%, source = src{doc_id % 20}, n_chars =
  *   length(text); a deterministic ~0.16% of docs exactly duplicate
  *   their predecessor (the dedup corpus needs non-empty clusters);
  *   doc_id stays < 100000 (the q371 recrawl-id invariant).
  * - events: ts strictly increasing in event_id over Jan 2024 (30
  *   days, 10× density per decade), users = 1.5% of rows, props =
  *   {"k": 0..99} JSON.
  * - lineitem: (l_orderkey, l_linenumber) intentionally NON-unique
  *   (the fixtures' known quirk — window/tiebreak queries depend on
  *   it); shipdate = orderdate + 1..95 days.
  * - part: p_retailprice = 900 + (p_partkey % 1000)/10 — the exact
  *   fixture rule.
  * - embeddings: 64-d unit-norm Gaussian vectors, label uniform 0..9
  *   (the fixtures carry no label-centroid structure — measured
  *   within-label cosine ≈ 0.07 ≈ chance).
  *
  * Usage: runMain graft.tools.DataGen <outDir> <sf>
  * (e.g. /root/repo/testdata_gen/sf1 1.0). Writes one single-file
  * <table>.parquet per table (single parquet files stay splittable by
  * row group, and the DuckDB oracle's read_parquet wants files).
  */
object DataGen {
  private val SEED = 42L

  // field tags keep the hash streams of different columns independent
  private def h(tag: Long, id: Column): Column =
    xxhash64(lit(SEED), lit(tag), id)
  /** uniform double in [0, 1) from the (tag, id) hash stream */
  private def u(tag: Long, id: Column): Column =
    shiftrightunsigned(h(tag, id), 11).cast("double") / lit((1L << 53).toDouble)
  /** uniform long in [0, n) */
  private def uMod(tag: Long, id: Column, n: Long): Column =
    pmod(h(tag, id), lit(n))
  private def pick(tag: Long, id: Column, vs: Seq[String]): Column =
    element_at(typedLit(vs), (uMod(tag, id, vs.size.toLong) + 1).cast("int"))
  private def round2(c: Column): Column = round(c, 2)

  final case class Sizes(customer: Long, supplier: Long, part: Long,
      orders: Long, lineitem: Long, events: Long, documents: Long,
      embeddings: Long)

  /** The driver's ladder, extrapolated (sub-linear docs/embeddings). */
  def sizes(sf: Double): Sizes = Sizes(
    customer = (150000 * sf).round.max(1),
    supplier = (10000 * sf).round.max(1),
    part = (200000 * sf).round.max(1),
    orders = (1500000 * sf).round.max(1),
    lineitem = (6000000 * sf).round.max(1),
    events = (1000000 * sf).round.max(1),
    documents = (50000 * sf).round.max(1).min(99999), // q371 invariant
    embeddings = (2000 * math.pow(4.0, math.log10(sf * 10)))
      .round.max(1))

  private val regions =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val pTypes =
    Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val adjs =
    Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
  private val nouns =
    Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
  private val vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")

  /** Lexicon scaled with corpus size (Heaps' law — real corpora grow
    * their vocabulary as they grow). The driver ladder stops at sf0.1
    * / 5,000 docs, where the 31-word vocab gives ~29.8k possible
    * 3-word shingles against ~260k doc-shingles; at 50,000 docs the
    * FIXED vocab would saturate the shingle space (~2.8M doc-shingles
    * over the same 29.8k possibilities), and every shingle-bucketed
    * candidate generator — and its DuckDB oracle — goes quadratic on
    * bucket collisions alone, a fixture artifact no real corpus
    * exhibits. Above 10k docs the vocab extends to 310 words (digit-
    * suffixed variants), holding shingle-collision density at or
    * below the sf0.1 fixture's; at or below 10k docs it is the exact
    * 31-word driver vocab, byte-compatible with the ladder. */
  private def vocabFor(nDocs: Long): Seq[String] =
    if (nDocs <= 10000) vocab
    else vocab ++ (1 to 9).flatMap(k => vocab.map(_ + k))
  private val langs = Seq("en", "zh", "es", "fr", "de")

  def region(s: SparkSession): DataFrame =
    s.range(5).select(col("id").cast("int").as("r_regionkey"),
      element_at(typedLit(regions), col("id").cast("int") + 1).as("r_name"))

  def nation(s: SparkSession): DataFrame =
    s.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      uMod(101, col("id"), 5).cast("int").as("n_regionkey"))

  def customer(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      uMod(201, col("id"), 25).cast("int").as("c_nationkey"),
      round2(u(202, col("id")) * 11000.0 - 1000.0).as("c_acctbal"),
      pick(203, col("id"), segments).as("c_mktsegment"))

  def supplier(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      uMod(301, col("id"), 25).cast("int").as("s_nationkey"),
      round2(u(302, col("id")) * 11000.0 - 1000.0).as("s_acctbal"))

  def part(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("p_partkey"),
      concat(pick(401, col("id"), adjs), lit(" "),
        pick(402, col("id"), nouns)).as("p_name"),
      concat(lit("Brand#"), uMod(403, col("id"), 25) + 1).as("p_brand"),
      pick(404, col("id"), pTypes).as("p_type"),
      (uMod(405, col("id"), 50) + 1).cast("int").as("p_size"),
      // the exact fixture rule: 900 + (key % 1000)/10
      round(lit(900.0) + pmod(col("id"), lit(1000)) * 0.1, 1)
        .as("p_retailprice"))

  /** order dates: uniform days over 1995-01-01 .. 2001-08-01. All
    * fixture timestamps are TIMESTAMP_NTZ (pyarrow writes
    * isAdjustedToUTC=false), so every generated timestamp casts to
    * ntz for schema parity. */
  private def orderDate(tag: Long, id: Column): Column =
    timestamp_seconds(lit(788918400L) + uMod(tag, id, 2405L) * 86400L)
      .cast("timestamp_ntz")

  def orders(s: SparkSession, n: Long, nCust: Long): DataFrame =
    s.range(n).select(col("id").as("o_orderkey"),
      uMod(501, col("id"), nCust).as("o_custkey"),
      pick(502, col("id"), Seq("O", "P", "F")).as("o_orderstatus"),
      round2(u(503, col("id")) * 499000.0 + 1000.0).as("o_totalprice"),
      orderDate(504, col("id")).as("o_orderdate"),
      pick(505, col("id"), priorities).as("o_orderpriority"))

  /** Each lineitem row draws its order key independently → Poisson
    * lines/order and a deliberately NON-unique (orderkey, linenumber),
    * matching the driver fixtures' quirk that tiebreak queries pin. */
  def lineitem(s: SparkSession, n: Long, nOrders: Long, nParts: Long,
      nSupp: Long): DataFrame =
    s.range(n)
      .select(col("id"), uMod(601, col("id"), nOrders).as("l_orderkey"))
      .select(col("id"), col("l_orderkey"),
        uMod(602, col("id"), nParts).as("l_partkey"),
        uMod(603, col("id"), nSupp).as("l_suppkey"),
        (uMod(604, col("id"), 7) + 1).cast("int").as("l_linenumber"),
        (uMod(605, col("id"), 50) + 1).cast("double").as("l_quantity"),
        round2(u(606, col("id")) * 104100.0 + 900.0).as("l_extendedprice"),
        round2(uMod(607, col("id"), 11).cast("double") / 100.0)
          .as("l_discount"),
        round2(uMod(608, col("id"), 9).cast("double") / 100.0).as("l_tax"),
        pick(609, col("id"), Seq("N", "A", "R")).as("l_returnflag"),
        pick(610, col("id"), Seq("O", "F")).as("l_linestatus"),
        // shipdate = this row's order's date + 1..95 days; re-derive the
        // order's date from ITS hash stream so no join is needed
        (timestamp_seconds(
          unix_timestamp(orderDate(504, col("l_orderkey"))
            .cast("timestamp")) +
            (uMod(611, col("id"), 95) + 1) * 86400L))
          .cast("timestamp_ntz").as("l_shipdate"))
      .drop("id")

  /** ts strictly increasing in event_id: ts_i = t0 + (i + jitter_i)·gap
    * with jitter ∈ [0,1) ⇒ consecutive deltas ∈ (0, 2·gap). */
  def events(s: SparkSession, n: Long): DataFrame = {
    val spanMicros = 30L * 86400L * 1000000L // Jan 2024
    val gap = spanMicros.toDouble / (n + 1).toDouble
    val nUsers = math.max(1L, (n * 0.015).round)
    s.range(n).select(col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + // 2024-01-01 UTC
        ((col("id").cast("double") + u(701, col("id"))) * gap)
          .cast("long")).cast("timestamp_ntz").as("ts"),
      uMod(702, col("id"), nUsers).as("user_id"),
      pick(703, col("id"),
        Seq("click", "view", "purchase", "signup", "error")).as("event_type"),
      round2(-lit(70.0) * log(lit(1.0) - u(704, col("id")))).as("value"),
      format_string("{\"k\": %d}", uMod(705, col("id"), 100)).as("props"))
  }

  /** 10–100 vocab words; ~0.16% of docs copy their predecessor's text
    * (deterministic: id % 625 == 624 re-derives id-1's word stream) —
    * the dedup corpus needs non-empty exact clusters at every scale. */
  def documents(s: SparkSession, n: Long): DataFrame = {
    require(n < 100000, "doc_id must stay < 100000 (q371 recrawl ids)")
    val voc = vocabFor(n)
    // Each doc draws its words from a doc-specific random SUBSET of
    // the lexicon (8..48 slots; slot s of doc d maps to vocab index
    // hash(d, s)): real corpora mix lexically-rich prose with
    // repetitious template/boilerplate docs, and the classifier
    // family's seed label (2·|distinct| ≥ |words|) NEEDS that mixture
    // — drawing every doc uniformly from a 310-word lexicon made all
    // 50k docs "diverse", emptied the bad class, and sent the
    // class-conditional means of q287/q308/s49 into divide-by-zero
    // (the r14 sf1 gate's third catch). Random non-contiguous subsets
    // keep cross-doc shingle collisions near zero (two docs share a
    // triple only if their subsets overlap in 3 hash-aligned words),
    // so the near-dup family stays linear.
    def textOf(id: Column): Column = {
      val k = uMod(805, id, 41) + 8 // per-doc subset size 8..48
      def slotWord(j: Column): Column = element_at(typedLit(voc),
        (pmod(xxhash64(lit(SEED), lit(806L), id,
          pmod(xxhash64(lit(SEED), lit(802L), id, j), k)),
          lit(voc.size)) + 1).cast("int"))
      array_join(
        transform(sequence(lit(0),
          (uMod(801, id, 91) + 9).cast("int")), // 10..100 words
          j => slotWord(j)), " ")
    }
    val src = s.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(625)) === 624 && col("id") > 0,
        textOf(col("id") - 1)).otherwise(textOf(col("id"))).as("text"),
      // en-heavy mix: 42% en, ~14.5% each zh/es/fr/de
      when(u(803, col("id")) < 0.42, "en").otherwise(
        pick(804, col("id"), langs.drop(1))).as("lang"),
      concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
    src.withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** 64-d unit-norm Gaussian (Box–Muller over the hash stream); labels
    * uniform 0..9 — the fixtures carry no centroid structure. */
  def embeddings(s: SparkSession, n: Long): DataFrame = {
    def gauss(id: Column, d: Column): Column = {
      val u1 = shiftrightunsigned(
        xxhash64(lit(SEED), lit(901L), id, d), 11).cast("double") /
        lit((1L << 53).toDouble)
      val u2 = shiftrightunsigned(
        xxhash64(lit(SEED), lit(902L), id, d), 11).cast("double") /
        lit((1L << 53).toDouble)
      sqrt(-lit(2.0) * log(lit(1.0) - u1)) * cos(lit(2.0 * math.Pi) * u2)
    }
    s.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d => gauss(col("id"), d))
        .as("raw"),
      uMod(903, col("id"), 10).cast("int").as("label"))
      .select(col("vec_id"),
        transform(col("raw"), x => (x / sqrt(aggregate(col("raw"),
          lit(0.0), (a, v) => a + v * v))).cast("float")).as("embedding"),
        col("label"))
  }

  /** Write df as a SINGLE parquet file at dir/name.parquet (DuckDB's
    * read_parquet wants a file; one file stays row-group-splittable
    * for Spark). Bounded: the repartition(1) write is the generator's
    * cost, not a query-path pattern. */
  private def writeOne(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = s"$dir/_tmp_$name"
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    val dest = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    println(s"[datagen] $name.parquet written")
  }

  def generate(s: SparkSession, outDir: String, sf: Double): Unit = {
    val sz = sizes(sf)
    println(s"[datagen] sf=$sf → $sz")
    writeOne(region(s), outDir, "region")
    writeOne(nation(s), outDir, "nation")
    writeOne(customer(s, sz.customer), outDir, "customer")
    writeOne(supplier(s, sz.supplier), outDir, "supplier")
    writeOne(part(s, sz.part), outDir, "part")
    writeOne(orders(s, sz.orders, sz.customer), outDir, "orders")
    writeOne(lineitem(s, sz.lineitem, sz.orders, sz.part, sz.supplier),
      outDir, "lineitem")
    writeOne(events(s, sz.events), outDir, "events")
    writeOne(documents(s, sz.documents), outDir, "documents")
    writeOne(embeddings(s, sz.embeddings), outDir, "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val Array(outDir, sfStr) = args.take(2)
    require(!outDir.startsWith("/root/testdata") &&
      !outDir.startsWith("/root/reference"), "driver dirs are read-only")
    val spark = SparkSession.builder()
      .appName("graft-datagen").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // ltz→ntz casts read the session TZ: pin it so the emitted
      // fixture bytes are environment-independent
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", sys.props.getOrElse(
        "spark.driver.memory", "8g"))
      .getOrCreate()
    try generate(spark, outDir, sfStr.toDouble)
    finally spark.stop()
  }
}
