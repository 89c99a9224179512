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
  ,

    // --------------------------------------------------------------- q293
    // SQL-bodied scalar UDF (Spark 4 `CREATE FUNCTION … RETURN expr`) —
    // the third face of the extension surface after q39's Scala UDF and
    // q40's typed UDAF, and at scale the BEST one: a SQL UDF is macro-
    // expanded into the calling plan at analysis time, so unlike a
    // Scala UDF (an opaque black box that breaks codegen, blocks
    // predicate pushdown and hides nullability) it stays inside
    // whole-stage codegen and optimizes like any expression — the
    // plan-level claim is spec-asserted (no ScalaUDF node survives).
    // The function scores document quality in integer milli-units
    // (TTR half-weight + capped chars-per-word) and the query rolls it
    // up per source; the oracle inlines the same body, which is
    // exactly the point — the UDF IS its expansion.
    QueryDef(
      "q293_sql_udf",
      (s, dir) => {
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_quality_milli(
                   nw BIGINT, nd BIGINT, nc BIGINT) RETURNS BIGINT
                 RETURN CASE WHEN nw = 0 THEN 0
                        ELSE nd * 500 div nw + least(nc div nw, 20) * 25
                        END""")
        Tables(s, dir, "documents").createOrReplaceTempView("docs_q293")
        s.sql("""
          SELECT source,
                 count(1) AS n_docs,
                 sum(graft_quality_milli(nw, nd, nc)) AS q_sum_milli,
                 sum(graft_quality_milli(nw, nd, nc)) div count(1)
                   AS q_mean_milli
          FROM (SELECT source,
                       cast(size(filter(split(text, ' '), w -> w <> ''))
                         AS BIGINT) AS nw,
                       cast(size(array_distinct(
                         filter(split(text, ' '), w -> w <> '')))
                         AS BIGINT) AS nd,
                       cast(length(replace(text, ' ', '')) AS BIGINT) AS nc
                FROM docs_q293)
          GROUP BY source
          ORDER BY source""")
      },
      Some("""
        WITH d AS (
          SELECT source,
                 CAST(len(wl) AS BIGINT) AS nw,
                 CAST(len(list_distinct(wl)) AS BIGINT) AS nd,
                 CAST(length(replace(text, ' ', '')) AS BIGINT) AS nc
          FROM (SELECT source, text,
                       list_filter(string_split(text, ' '),
                         w -> w <> '') AS wl
                FROM documents)),
        q AS (
          SELECT source,
                 CASE WHEN nw = 0 THEN 0
                      ELSE nd * 500 // nw + least(nc // nw, 20) * 25
                 END AS qm
          FROM d)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(qm) AS BIGINT) AS q_sum_milli,
               CAST(SUM(qm) AS BIGINT) // COUNT(*) AS q_mean_milli
        FROM q
        GROUP BY source
        ORDER BY source"""))
  )
}
