package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Udfs

/** q196's typed row and group-report shapes (top-level: Spark derives
  * product Encoders for these at the Dataset boundary). */
final case class LineRow(l_orderkey: Long, l_quantity: Double,
    l_extendedprice: Double, l_returnflag: String)
final case class FlagReport(l_returnflag: String, n_lines: Long,
    total_cents: Long, max_line_cents: Long)

/** Queries exercising the registered user-function surface
  * (see [[graft.functions.Udfs]]). */
object UdfQueries {

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q39
    // Scalar UDF through the SQL registry.
    QueryDef(
      "q39_scalar_udf",
      (s, dir) => {
        Udfs.register(s)
        Tables(s, dir, "documents").createOrReplaceTempView("graft_docs_udf")
        s.sql("""
          SELECT doc_id, nonspace_len(text) AS ns_len
          FROM graft_docs_udf
          ORDER BY doc_id""")
      },
      Some("""
        SELECT doc_id, CAST(length(replace(text, ' ', '')) AS INT) AS ns_len
        FROM documents
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q40
    // Typed Aggregator (UDAF) with exact cents buffer; partial aggregation
    // (map-side combine on the Long buffer) still applies — the buffer is
    // 8 bytes, so the shuffle is as small as a built-in sum's.
    QueryDef(
      "q40_typed_udaf",
      (s, dir) => {
        Udfs.register(s)
        Tables(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            expr("exact_money_sum(o_totalprice)").as("sum_total"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // --------------------------------------------------------------- q196
    // Typed Dataset surface — the case-class face of the engine: a
    // Dataset[LineRow] runs a typed filter, groupByKey on a field, and
    // mapGroups folding each group into a typed FlagReport. The fold
    // accumulates exact integer cents with max/count — ORDER-INDEPENDENT
    // operations only, because mapGroups iterators carry no ordering
    // guarantee. Scale note, stated so nobody copies this shape blindly:
    // mapGroups ships every row of a group to one task (no partial
    // aggregation) — right for genuinely holistic per-group logic; for
    // reducible folds like this one, production code uses the q40 typed
    // Aggregator (map-side combine) — this operator pins the API surface
    // and its encoder path, with the same oracle as the relational
    // formulation.
    QueryDef(
      "q196_typed_dataset_ops",
      (s, dir) => {
        import s.implicits._
        val ds = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_returnflag"))
          .as[LineRow]
        ds.filter(_.l_quantity > 25.0)
          .groupByKey(_.l_returnflag)
          .mapGroups { (flag, rows) =>
            var n = 0L; var total = 0L; var mx = 0L
            rows.foreach { r =>
              val cents = new java.math.BigDecimal(r.l_extendedprice)
                .setScale(2, java.math.RoundingMode.HALF_UP)
                .movePointRight(2).longValueExact()
              n += 1; total += cents; if (cents > mx) mx = cents
            }
            FlagReport(flag, n, total, mx)
          }
          .toDF()
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                 AS BIGINT)) AS BIGINT) AS total_cents,
               CAST(MAX(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                 AS BIGINT)) AS BIGINT) AS max_line_cents
        FROM lineitem
        WHERE l_quantity > 25.0
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""))
  )
}
