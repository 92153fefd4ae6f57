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
    },

    // As-of join (J10): each error event → latest signup of the same user
    // at or before it, via the union-and-carry plan (one shuffle, linear).
    "q23_asof_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      graft.operators.TemporalJoins.asOfJoin(
          left = ev.filter(col("event_type") === "error")
            .select("event_id", "user_id", "ts"),
          right = ev.filter(col("event_type") === "signup"),
          keyCol = "user_id", tsCol = "ts",
          rightPayload = Seq("ts"))
        .withColumnRenamed("asof_ts", "signup_ts")
        .orderBy("event_id")
    },

    // Bounded range join (J10): same-user event pairs within 120 seconds,
    // bucketized to an equi-join (no nested-loop).
    "q24_range_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      graft.operators.TemporalJoins.rangeJoin(
          ev, ev, keyCol = "user_id", tsCol = "ts", idCol = "event_id",
          widthSec = 120L)
        .filter(col("left_id") < col("right_id"))
        .select("user_id", "left_id", "right_id")
        .orderBy("user_id", "left_id", "right_id")
    },
  )

  val oracle: Map[String, String] = Map(
    "q23_asof_join" ->
      """SELECT e.event_id, e.user_id, e.ts, s.ts AS signup_ts
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
         ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
           ON e.user_id = s.user_id AND e.ts >= s.ts
         ORDER BY event_id""",

    "q24_range_join" ->
      """SELECT a.user_id, a.event_id AS left_id, b.event_id AS right_id
         FROM events a JOIN events b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND ABS(DATE_DIFF('second', b.ts, a.ts)) <= 120
         ORDER BY a.user_id, left_id, right_id""",

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
