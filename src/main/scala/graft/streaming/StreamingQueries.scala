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
    * arrival folder. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val path = s"$dir/events.parquet"
    val sf = Paths.get(dir).getFileName.toString
    val landing = Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_stream_events/$sf")
    Files.createDirectories(landing)
    val staged = landing.resolve("events.parquet")
    if (!Files.exists(staged)) {
      // copy-then-atomic-move so an interrupted prior run can't leave a
      // truncated file that a later run would trust
      val tmp = landing.resolve(s".events.parquet.tmp")
      Files.copy(Paths.get(path), tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, staged, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
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
        ORDER BY user_id, session_id"""))
  )
}
