package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.operators.{Exact, QueryDef}

/** Event-time streaming operators over the `events` fixture — the
  * streaming twins of q19 (tumbling window) and q20 (sessionization),
  * checked against the SAME oracles: each runs a real Structured
  * Streaming query (file source → event-time transform → sink), drains it
  * with Trigger.AvailableNow, and returns the sink table.
  *
  * The file source stands in for Kafka (no connector on this classpath);
  * everything downstream of the source is stream-agnostic.
  *
  * 100 TB scale: both are keyed stateful aggregations — state partitions
  * by window/user across executors; watermarks bound state size (1 hour
  * of event-time for the window aggregation; sessions time out with the
  * watermark in continuous deployments).
  */
/** Encoder row types for the stateful operator (top-level: Spark's codegen
  * needs public accessors on encoder targets). */
final case class Ev(user_id: Long, event_id: Long, ts_us: Long)
final case class SessionOut(
    user_id: Long, session_id: Long, n_events: Long, start_us: Long, end_us: Long)

object StreamingQueries {

  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stream the events table through a file source (schema from the batch
    * reader — streaming sources require an explicit schema). The file
    * source only accepts directories, so the fixture file is staged once
    * into a landing directory — the moral equivalent of a stream's
    * arrival folder. `copies > 1` stages the file N times (distinct
    * names), simulating an at-least-once source that replays its data.
    */
  private def eventsStream(s: SparkSession, dir: String, copies: Int = 1): DataFrame = {
    import java.nio.file.{Files, Paths}
    val path = s"$dir/events.parquet"
    val sf = Paths.get(dir).getFileName.toString
    val landing = Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_stream_events/$sf/x$copies")
    Files.createDirectories(landing)
    for (i <- 1 to copies) {
      val staged = landing.resolve(s"events_$i.parquet")
      if (!Files.exists(staged)) {
        // copy-then-atomic-move so an interrupted prior run can't leave a
        // truncated file that a later run would trust
        val tmp = landing.resolve(s".events_$i.parquet.tmp")
        Files.copy(Paths.get(path), tmp,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, staged, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    val schema = s.read.parquet(path).schema
    s.readStream.schema(schema).parquet(landing.toString)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }

  /** Run `build`'s streaming output into a memory sink, drain with
    * AvailableNow, return the materialized table. */
  private def drain(s: SparkSession, mode: OutputMode)(df: DataFrame): DataFrame = {
    val sink = s"graft_stream_sink_${nameCounter.incrementAndGet()}"
    val q = df.writeStream
      .format("memory").queryName(sink)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- s01
    // Streaming tumbling window: watermarked event-time aggregation.
    // Complete output mode so the single AvailableNow batch emits every
    // window (append would hold windows open behind the final watermark).
    // Oracle: identical to q19's.
    QueryDef(
      "s01_stream_tumbling_window",
      (s, dir) => {
        val agg = eventsStream(s, dir)
          .withWatermark("ts_t", "1 hour")
          .groupBy(window(col("ts_t"), "1 hour"))
          .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("sum_value"))
        drain(s, OutputMode.Complete())(agg)
          .select(unix_micros(col("window.start")).as("ws_us"),
            col("n_events"), col("sum_value"))
          .orderBy("ws_us")
      },
      Some("""
        SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS ws_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
        ORDER BY ws_us""")),

    // ---------------------------------------------------------------- s02
    // Streaming sessionization via flatMapGroupsWithState — the custom
    // stateful operator surface (SURVEY §2.9 "stateful streaming ops").
    // Same 10-minute-gap semantics as q20; AvailableNow delivers each
    // user's events in one group invocation, so every session (including
    // the open tail) is emitted deterministically. Oracle: q20's, minus
    // the value sum (kept integer-only).
    QueryDef(
      "s02_stream_sessionization",
      (s, dir) => {
        import s.implicits._
        val gapUs = 600L * 1000000L
        val evs = eventsStream(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_us")).as[Ev]
        val sessions = evs
          .groupByKey(_.user_id)
          .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
            (uid: Long, it: Iterator[Ev], state: GroupState[Long]) =>
              val sorted = it.toArray.sortBy(e => (e.ts_us, e.event_id))
              val out = Seq.newBuilder[SessionOut]
              var sid = 0L; var n = 0L
              var start = 0L; var last = Long.MinValue
              for (e <- sorted) {
                if (last == Long.MinValue || e.ts_us - last > gapUs) {
                  if (n > 0) out += SessionOut(uid, sid, n, start, last)
                  sid += 1; n = 0L; start = e.ts_us
                }
                n += 1; last = e.ts_us
              }
              if (n > 0) out += SessionOut(uid, sid, n, start, last)
              state.update(sid) // session counter survives future batches
              out.result().iterator
          }
        drain(s, OutputMode.Append())(sessions.toDF())
          .orderBy("user_id", "session_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id,
                          epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
                   FROM events),
        g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                              OR ts_us - lag(ts_us) OVER w > 600000000
                             THEN 1 ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        sg AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
               FROM g)
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
        FROM sg
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // ---------------------------------------------------------------- s03
    // Streaming dedup under replay: the source delivers every event TWICE
    // (an at-least-once source replaying), `dropDuplicates` on the event
    // key restores exactly-once counts — the replay-convergence pattern
    // the transfer pipeline's DLQ/job_id dedup relies on (SURVEY §7.4).
    // Oracle: plain single-delivery counts.
    QueryDef(
      "s03_stream_dedup_replay",
      (s, dir) => {
        val agg = eventsStream(s, dir, copies = 2)
          .withWatermark("ts_t", "1 hour")
          .dropDuplicates("event_id")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"))
        drain(s, OutputMode.Complete())(agg)
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---------------------------------------------------------------- s04
    // Watermarked stream-stream interval join: each purchase joined to
    // the same user's views in the preceding hour. Inner joins emit
    // matches as they form; the watermark + time-range condition bound
    // the view-side state. Oracle: the equivalent batch interval join.
    QueryDef(
      "s04_stream_stream_join",
      (s, dir) => {
        val base = eventsStream(s, dir)
        val views = base.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts_us").as("v_us"), col("ts_t").as("v_t"))
          .withWatermark("v_t", "10 minutes")
        val purchases = base.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts_us").as("p_us"), col("ts_t").as("p_t"))
          .withWatermark("p_t", "10 minutes")
        val joined = purchases.join(views,
          col("p_user") === col("v_user")
            && col("v_t") <= col("p_t")
            && col("v_t") >= col("p_t") - expr("INTERVAL 1 HOUR"))
        drain(s, OutputMode.Append())(
          joined.select("purchase_id", "view_id", "p_us", "v_us"))
          .orderBy("purchase_id", "view_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id, event_type,
                          epoch_us(CAST(ts AS TIMESTAMP)) AS us
                   FROM events)
        SELECT p.event_id AS purchase_id, v.event_id AS view_id,
               p.us AS p_us, v.us AS v_us
        FROM e p JOIN e v
          ON p.event_type = 'purchase' AND v.event_type = 'view'
         AND p.user_id = v.user_id
         AND v.us <= p.us AND v.us >= p.us - 3600000000
        ORDER BY purchase_id, view_id"""))
  )
}
