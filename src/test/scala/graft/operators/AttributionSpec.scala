package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec, Tables}

/** Credit-conservation pins for the attribution models: every attributed
  * purchase distributes exactly ~1e6 ppm across its touches (up to the
  * documented truncation loss), and both models attribute the same
  * purchase set. Runs at sf0.001.
  */
class AttributionSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  /** (attributed purchases, middle-touch count) from the raw fixture. */
  private lazy val ground: (Long, Long) = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("p_id"),
        col("ts_us").as("p_us"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("tu"), col("ts_us").as("t_us"))
    val paired = p.join(t, col("pu") === col("tu")
      && col("t_us") < col("p_us")
      && col("t_us") >= col("p_us") - 86400000000L)
    val per = paired.groupBy("p_id").agg(count(lit(1)).as("n"))
      .select(col("n")).as[Long].collect()
    (per.length.toLong, per.filter(_ >= 3).map(_ - 2).sum)
  }

  test("q178 linear credit conserves ~1e6 ppm per attributed purchase") {
    import spark.implicits._
    val rows = run("q178_multitouch_attribution")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == Set("click", "view"))
    val total = rows.map(_._4).sum
    val (nPurchases, _) = ground
    // each purchase's n touches each earn 1e6 div n: loss < n per purchase
    assert(total <= 1000000L * nPurchases)
    assert(total > 1000000L * nPurchases - 1000L * nPurchases,
      s"credit $total strays from ${1000000L * nPurchases}")
  }

  test("q179 U-shaped credit conserves ~1e6 ppm per attributed purchase") {
    import spark.implicits._
    val rows = run("q179_ushape_attribution")
      .as[(String, String, Long, Long)].collect()
    assert(rows.map(_._2).toSet.subsetOf(Set("only", "first", "middle", "last")))
    val total = rows.map(_._4).sum
    val (nPurchases, nMiddles) = ground
    // truncation only in the middle share: loss < (n-2) per >=3-touch path
    assert(total <= 1000000L * nPurchases)
    assert(total >= 1000000L * nPurchases - nMiddles,
      s"credit $total lost more than the $nMiddles middle-truncation bound")
  }

  test("q200 capped balance matches a local sequential recurrence") {
    import spark.implicits._
    val rows = SparkEntry.queries("q200_capped_running_balance")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the distributed secondary-sort scan must reproduce the literal
    // recurrence b_t = max(0, b_{t-1} + d_t), user by user, row by row
    rows.groupBy(_._1).foreach { case (_, rs) =>
      var bal = 0L
      rs.sortBy(r => (r._3, r._2)).foreach { case (u, id, _, d, got) =>
        bal = math.max(0L, bal + d)
        assert(got == bal, s"user $u event $id: got $got, recurrence gives $bal")
      }
    }
  }
}
