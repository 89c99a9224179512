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

  test("oracle SQL column aliases match the driver contract (no bare aggregates)") {
    // the driver hash-compares by sorted column NAME — a bare SUM(x)
    // column would mismatch; require every oracle to alias aggregates
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.toLowerCase.matches("(?s).*select[^a-z]*sum\\([^)]*\\)\\s*(,|from).*"),
        s"$name: unaliased aggregate in oracle SQL")
    }
  }
}
