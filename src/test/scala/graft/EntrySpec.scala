package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows on sf0.001, every query
  * has a runnable definition, and oracle keys are a subset of queries. */
class EntrySpec extends AnyFunSuite {

  test("entry() flagship returns rows at sf0.001") {
    assert(SparkEntry.entry(SparkSpec.spark).count() > 0)
  }

  test("every oracle key has a matching query; names are unique") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o.diff(q)}")
    assert(SparkEntry.defs.map(_.name).distinct.size == SparkEntry.defs.size,
      "duplicate query names")
  }

  test("bench short keys (qNN/sNN/pNN prefixes) never collide") {
    // Bench emits each query under its prefix before the first underscore
    // and hard-fails on collision — catch it here, before a driver round
    // loses its bench line to a name slip
    val keys = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    assert(keys.distinct.size == keys.size,
      s"colliding bench keys: ${keys.diff(keys.distinct).distinct.mkString(",")}")
  }

  test("oracle window SUMs feeding the final SELECT are CAST-enclosed") {
    // r09 q297: DuckDB widens SUM(BIGINT) OVER (...) to HUGEINT, so any
    // arithmetic riding an uncast window SUM reaches the driver as
    // decimal128 while Spark emits int64 — rows/schema green, hash red.
    // Require window SUMs in the OUTPUT-facing (final top-level) SELECT
    // to sit inside some enclosing CAST(...) (the q316 `CAST(... AS
    // BIGINT)` discipline). Intermediate-CTE window SUMs may widen
    // legitimately (they re-narrow downstream); the class as a whole is
    // gated EXECUTABLY by scripts/selfcheck.py, which fails any oracle
    // whose arrow output schema carries a decimal128 column.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val bad = EntrySpec.uncastWindowSums(sql)
        .filter(_ >= EntrySpec.finalSelectOffset(sql))
      assert(bad.isEmpty,
        s"$name: window SUM in the final SELECT without an enclosing CAST " +
          s"at char offsets ${bad.mkString(",")} — DuckDB widens it to " +
          "HUGEINT/decimal128 and the driver's typed hash goes red on " +
          "type alone")
    }
  }

  test("the window-SUM lint itself fires on an injected uncast oracle") {
    def offenders(sql: String): Seq[Int] =
      EntrySpec.uncastWindowSums(sql)
        .filter(_ >= EntrySpec.finalSelectOffset(sql))
    val bad = "SELECT k, SUM(v) OVER () AS tot FROM t"
    assert(offenders(bad).nonEmpty)
    // the r09 q297 shape: CTE is fine, final SELECT rides the widened p
    val badCte =
      "WITH r AS (SELECT 1 AS p) SELECT greatest(p * 9 // nullif(SUM(p) OVER (), 0), 1) AS x FROM r"
    assert(offenders(badCte).nonEmpty)
    val ok = "SELECT k, CAST(SUM(v) OVER () AS BIGINT) AS tot FROM t"
    assert(offenders(ok).isEmpty)
    val okDeep =
      "SELECT greatest(CAST(p * 9 // nullif(SUM(p) OVER (), 0) AS BIGINT), 1) AS x FROM t"
    assert(offenders(okDeep).isEmpty)
    // ADVICE r10 (a): an enclosing identifier merely ENDING in "cast"
    // (broadcast(...), fakecast(...)) must not satisfy the lint
    val badSuffix = "SELECT fakecast(SUM(v) OVER ()) AS x FROM t"
    assert(offenders(badSuffix).nonEmpty)
    // ADVICE r10 (b): a window SUM in an EARLIER UNION ALL branch of the
    // output statement is just as output-facing as the last branch
    val badUnion =
      "WITH r AS (SELECT 1 AS p) SELECT SUM(p) OVER () AS x FROM r " +
        "UNION ALL SELECT CAST(0 AS BIGINT) AS x"
    assert(offenders(badUnion).nonEmpty)
  }

  test("every global window / driver collect states its bound (src/main lint)") {
    // VERDICT r11 item 4: a partition-less Window or a .collect() is
    // only scale-safe when the frame it rides is bounded BY
    // CONSTRUCTION, and that bound must be stated where the operator
    // sits — most sites carry a "≤ N rows by construction" note, this
    // lint makes the discipline total: every Window.orderBy( /
    // Window.partitionBy() / .collect() hit in src/main needs a
    // bound-stating comment within 3 lines.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val bad = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val lines = java.nio.file.Files.readAllLines(p).asScala.toIndexedSeq
        EntrySpec.unboundedHits(lines).map(ln => s"$p:$ln")
      }.toSeq
    assert(bad.isEmpty,
      s"global window / collect without a bound comment within 3 lines:\n  " +
        bad.mkString("\n  "))
  }

  test("the bound lint itself fires on injected unbounded hits") {
    def hits(src: String): Seq[Int] =
      EntrySpec.unboundedHits(src.linesIterator.toIndexedSeq)
    // naked global window → flagged
    assert(hits("val w = Window.orderBy(col(\"x\"))").nonEmpty)
    assert(hits("val w = Window.partitionBy()").nonEmpty)
    assert(hits("val rows = df.collect()").nonEmpty)
    // same-line bound comment → clean
    assert(hits("val w = Window.orderBy(col(\"x\")) // ≤ 5 rows by construction").isEmpty)
    assert(hits("val rows = df.collect() // bounded: 3 return flags").isEmpty)
    // comment within 3 lines above → clean
    assert(hits("// frame is bounded: <= sources rows\nval a = 1\nval w = Window.orderBy(col(\"x\"))").isEmpty)
    // comment too far (4 lines) → flagged
    assert(hits("// bounded: <= sources rows\nval a = 1\nval b = 2\nval c = 3\nval w = Window.orderBy(col(\"x\"))").nonEmpty)
    // a non-comment <= on a nearby CODE line must NOT satisfy the lint
    assert(hits("val f = col(\"rk\") <= 10L\nval w = Window.orderBy(col(\"x\"))").nonEmpty)
    // ADVICE r12: unrelated nearby comments that merely CONTAIN "bound"
    // must not satisfy it — "unbounded" and quantity-less "bound" phrases
    assert(hits("// an unbounded stream arrives here\nval w = Window.orderBy(col(\"x\"))").nonEmpty)
    assert(hits("// the lower bound of the loop\nval w = Window.orderBy(col(\"x\"))").nonEmpty)
    // while a real quantity-carrying "bound" phrase still passes
    assert(hits("// bound: 3 return flags\nval w = Window.orderBy(col(\"x\"))").isEmpty)
    assert(hits("// frame bound by doc length\nval w = Window.orderBy(col(\"x\"))").isEmpty)
    // keyed windows / Scala-collection collect{...} are out of scope
    assert(hits("val w = Window.partitionBy(\"k\").orderBy(\"x\")").isEmpty)
    assert(hits("xs.collect { case x => x }").isEmpty)
  }

  test("oracle SQL column aliases match the driver contract (no bare aggregates)") {
    // the driver hash-compares by sorted column NAME — a bare SUM(x)
    // column would mismatch; require every oracle to alias aggregates
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.toLowerCase.matches("(?s).*select[^a-z]*sum\\([^)]*\\)\\s*(,|from).*"),
        s"$name: unaliased aggregate in oracle SQL")
    }
  }
}

object EntrySpec {
  /** 1-based lines of partition-less windows (`Window.orderBy(`,
    * `Window.partitionBy()`) or driver collects (`.collect()`) with no
    * bound-stating comment within `radius` lines above (or on the hit
    * line / the line after). A bound comment (ADVICE r12 tightening —
    * the former any-"bound" matcher accepted "unbounded" and "lower
    * bound of the loop") must actually STATE a bound: "≤/<= <thing>",
    * the word "bounded" (never as part of "unbounded"), or "bound"
    * together with a quantity-ish token (digit/N/rows/docs/sources/
    * length/construction) on the same comment line. Code-line `<=`s
    * don't count. Proven by the injected cases in the spec. */
  def unboundedHits(lines: IndexedSeq[String], radius: Int = 3): Seq[Int] = {
    val hitRe =
      "Window\\s*\\.\\s*(orderBy\\(|partitionBy\\(\\))|\\.collect\\(\\)".r
    val boundRe = ("(?i)(?:≤|<=)\\s*\\S" +
      "|(?<![a-z])bounded\\b" +
      "|\\bbound\\b(?=[^.!?]*(?:\\d|\\bN\\b|rows|docs|sources|length|construction))").r
    def commentText(l: String): String = {
      val i = l.indexOf("//")
      val t = l.trim
      if (i >= 0) l.substring(i + 2)
      else if (t.startsWith("*") || t.startsWith("/*")) t
      else ""
    }
    lines.zipWithIndex.collect {
      case (l, i) if hitRe.findFirstIn(l).isDefined &&
        !(math.max(0, i - radius) to math.min(lines.size - 1, i + 1))
          .exists(j => boundRe.findFirstIn(commentText(lines(j))).isDefined)
      => i + 1
    }
  }

  /** Char offset of the FIRST top-level (paren-depth-0) SELECT — the
    * start of the output-facing statement whose column types reach the
    * driver. CTE bodies sit inside parens (depth ≥ 1) and so come before
    * it; everything at or after it — including every UNION ALL branch,
    * which the former last-SELECT scan missed (ADVICE r10) — is
    * output-facing. */
  def finalSelectOffset(sql: String): Int = {
    val s = sql.toLowerCase
    var d = 0; var i = 0
    while (i < s.length) {
      s(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && s.startsWith("select", i) &&
            (i == 0 || !s(i - 1).isLetterOrDigit)) return i
      }
      i += 1
    }
    0
  }

  /** Char offsets of window SUMs (`SUM(...) OVER (`) not enclosed by any
    * CAST(...) at any paren depth. Paren-aware, comment/string-naive —
    * good enough for the in-repo oracle corpus, proven by the injected
    * positive/negative cases above. */
  def uncastWindowSums(sql: String): Seq[Int] = {
    val s = sql.toLowerCase
    val sumRe = "\\bsum\\s*\\(".r
    def matchClose(open: Int): Int = {
      var d = 0; var i = open
      while (i < s.length) {
        if (s(i) == '(') d += 1
        else if (s(i) == ')') { d -= 1; if (d == 0) return i }
        i += 1
      }
      -1
    }
    def enclosedByCast(pos: Int): Boolean = {
      // walk backward; every time we cross an UNMATCHED '(' (an enclosing
      // paren), check whether the word before it is `cast`
      var d = 0; var i = pos - 1
      while (i >= 0) {
        if (s(i) == ')') d += 1
        else if (s(i) == '(') {
          if (d == 0) {
            var j = i - 1
            while (j >= 0 && s(j).isWhitespace) j -= 1
            // word boundary required (ADVICE r10): "broadcast(" or any
            // identifier merely ENDING in cast must not count
            if (j >= 3 && s.substring(j - 3, j + 1) == "cast" &&
              (j == 3 || (!s(j - 4).isLetterOrDigit && s(j - 4) != '_')))
              return true
          } else d -= 1
        }
        i -= 1
      }
      false
    }
    sumRe.findAllMatchIn(s).flatMap { m =>
      val open = s.indexOf('(', m.start)
      val close = matchClose(open)
      val isWindow = close > 0 &&
        s.drop(close + 1).dropWhile(_.isWhitespace).startsWith("over")
      if (isWindow && !enclosedByCast(m.start)) Some(m.start) else None
    }.toSeq
  }
}
