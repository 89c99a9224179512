package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics operators over the `events` fixture: funnel
  * conversion and cohort retention — the two queries every event
  * warehouse serves daily, absent from the reference (which only moves
  * events) and from the relational §2 families (which aggregate but
  * don't sequence).
  *
  * Both are pure integer event-time arithmetic (epoch micros / day
  * indexes), so the DuckDB oracle hash-matches without tolerance.
  *
  * 100 TB scale design: every stage keys on user_id — the funnel's
  * three stage aggregates and their joins share one hash-partitioning,
  * so Catalyst plans ONE user exchange and reuses it (no re-shuffle
  * between stages); retention's two aggregates reduce map-side before
  * moving (distinct activity days collapse per partition first). No
  * windows, no broadcasts of SF-scaling sides, no driver loops.
  */
object EventAnalytics {

  private val HourUs = 3600000000L
  private val DayUs = 86400000000L

  val all: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q108
    // Funnel conversion view → click → purchase within one hour of the
    // first view: per user, t1 = first view, t2 = first click AFTER t1,
    // t3 = first purchase AFTER t2; a stage counts when it lands within
    // t1 + 1h. The stage sequence ("first X after the first Y" — what a
    // plain GROUP BY cannot see) is three CHAINED window minimums over
    // the SAME user_id partitioning: each Window node reads the prior
    // one's column, and because the partitioning never changes Catalyst
    // plans exactly ONE user exchange for the whole funnel (a staged
    // aggregate-and-join formulation planned six; plan-asserted in
    // ScaleSpec). The per-user rollup then rides the same partitioning,
    // and only the single-row funnel report leaves the executors.
    QueryDef(
      "q108_funnel_analysis",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        val staged = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("event_type"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts_us"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click"
              && col("ts_us") > col("t1"), col("ts_us"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase"
              && col("ts_us") > col("t2"), col("ts_us"))).over(w))
        staged.groupBy("user_id")
          .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
          .filter(col("t1").isNotNull)
          .agg(
            count(lit(1)).as("n_view"),
            sum(when(col("t2") <= col("t1") + HourUs, 1L).otherwise(0L)).as("n_click_1h"),
            sum(when(col("t2") <= col("t1") + HourUs
              && col("t3") <= col("t1") + HourUs, 1L).otherwise(0L)).as("n_purchase_1h"))
          .withColumn("click_permille", expr("n_click_1h * 1000 div n_view"))
          .withColumn("purchase_permille", expr("n_purchase_1h * 1000 div n_view"))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
          FROM events),
        v AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT ev.user_id, v.t1, MIN(ts_us) AS t2
              FROM ev JOIN v ON ev.user_id = v.user_id
              WHERE event_type = 'click' AND ts_us > v.t1
              GROUP BY ev.user_id, v.t1),
        p AS (SELECT ev.user_id, c.t1, c.t2, MIN(ts_us) AS t3
              FROM ev JOIN c ON ev.user_id = c.user_id
              WHERE event_type = 'purchase' AND ts_us > c.t2
              GROUP BY ev.user_id, c.t1, c.t2)
        SELECT COUNT(*) AS n_view,
               CAST(SUM(CASE WHEN c.t2 <= v.t1 + $HourUs
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_click_1h,
               CAST(SUM(CASE WHEN c.t2 <= v.t1 + $HourUs
                              AND p.t3 <= v.t1 + $HourUs
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_1h,
               CAST(SUM(CASE WHEN c.t2 <= v.t1 + $HourUs
                             THEN 1 ELSE 0 END) AS BIGINT) * 1000
                 // COUNT(*) AS click_permille,
               CAST(SUM(CASE WHEN c.t2 <= v.t1 + $HourUs
                              AND p.t3 <= v.t1 + $HourUs
                             THEN 1 ELSE 0 END) AS BIGINT) * 1000
                 // COUNT(*) AS purchase_permille
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON v.user_id = p.user_id""")),

    // --------------------------------------------------------------- q109
    // Cohort retention: users are cohorted by their first-activity day
    // (integer day index of the min event time) and counted back on
    // each later day they return — the (cohort_day, offset_days) →
    // distinct-users triangle. Day indexes are exact integer division
    // of epoch micros; the distinct (user, day) activity set collapses
    // map-side before the cohort join, so the join and final aggregate
    // move one row per user-day, not per event.
    QueryDef(
      "q109_cohort_retention",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
        val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
        val activity = ev.distinct()
        activity.join(cohort, "user_id")
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_day", "offset_days")
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) // $DayUs AS day
          FROM events),
        cohort AS (SELECT user_id, MIN(day) AS cohort_day
                   FROM ev GROUP BY user_id),
        activity AS (SELECT DISTINCT user_id, day FROM ev)
        SELECT c.cohort_day,
               a.day - c.cohort_day AS offset_days,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM activity a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY c.cohort_day, offset_days
        ORDER BY cohort_day, offset_days"""))
  )
}
