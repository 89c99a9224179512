package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Udfs

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
        ORDER BY o_orderstatus"""))
  )
}
