package graft.queries

import org.apache.spark.sql.functions._

/** Event-time window surface over `events` — the batch twins of the
  * Structured Streaming operators in [[graft.streaming.EventStreams]]
  * (SURVEY.md §2.9 ST4). Sliding windows are oracled as a union of
  * shifted tumbling buckets; session windows as gaps-and-islands SQL.
  */
object EventQueries {

  val queries: Map[String, Query] = Map(
    // Sliding window: 2-hour windows every hour — each event lands in 2.
    "q21_sliding_windows" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")
    },

    // Session windows: 30-minute inactivity gap per user.
    "q22_session_windows" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start")
    }
  )

  val oracle: Map[String, String] = Map(
    "q21_sliding_windows" ->
      s"""SELECT window_start, event_type, COUNT(*) AS n,
          ${sqlDsum("value")} AS total_value
          FROM (
            SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) AS window_start, event_type, value FROM events
            UNION ALL
            SELECT TIME_BUCKET(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR AS window_start, event_type, value FROM events)
          GROUP BY window_start, event_type
          ORDER BY window_start, event_type""",

    "q22_session_windows" ->
      s"""SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n_events,
          ${sqlDsum("value")} AS total_value
          FROM (
            SELECT user_id, ts, value,
              SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
              SELECT user_id, ts, value,
                CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
              FROM events))
          GROUP BY user_id, session_id
          ORDER BY user_id, session_start"""
  )
}
