package graft.queries

import graft.functions.GraftFunctions
import graft.streaming.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Advanced surface: gap-based sessionization (the batch face of the
  * streaming operator — StreamingSpec proves the flatMapGroupsWithState
  * path emits identical sessions) and the native Catalyst expressions
  * exercised end-to-end from SQL.
  */
object Advanced {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessions (30 min) per user over the events table.
    // Integer-millisecond arithmetic end to end.
    "q25_sessionize" -> { (s, d) =>
      Sessions.sessionizeBatch(Tables.events(s, d))
    },

    // kafka_date_format as a native codegen expression, driven from
    // SQL through the session registry (T9 at query speed).
    "q26_kafka_format" -> { (s, d) =>
      GraftFunctions.register(s)
      Tables.events(s, d).createOrReplaceTempView("events_v")
      s.sql(
        """SELECT DISTINCT kafka_date_format(
             date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")) AS kafka_ts
           FROM events_v""")
    }
  )

  val oracle: Map[String, String] = Map(
    "q25_sessionize" ->
      s"""WITH e AS (
            SELECT user_id::BIGINT user_id, epoch_ms(ts)::BIGINT ts_ms,
                   round(value * 100)::BIGINT value_x100
            FROM events),
          flagged AS (
            SELECT user_id, ts_ms, value_x100,
                   CASE WHEN lag(ts_ms) OVER w IS NULL
                             OR ts_ms - lag(ts_ms) OVER w > ${Sessions.GapMs} THEN 1 ELSE 0 END new_session
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms))
          SELECT user_id, min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms,
                 count(*) AS n_events, sum(value_x100)::BIGINT AS total_value_x100
          FROM (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) session_no
                FROM flagged)
          GROUP BY user_id, session_no""",
    "q26_kafka_format" ->
      """SELECT DISTINCT strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || '+0000' AS kafka_ts FROM events"""
  )
}
