package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization + windowed aggregation, batch AND streaming.
  *
  * The reference is pure batch; its watermark-like piece is the static
  * time filter (F2). This module is the engine's forward surface for
  * the same event data arriving as a stream:
  *
  *  - [[sessionizeBatch]] — gap-based sessions via lag/cumsum window
  *    functions (integer-ms arithmetic; DuckDB-oracle-checkable).
  *  - [[sessionizeStream]] — identical session semantics under
  *    Structured Streaming with `flatMapGroupsWithState` (event-time
  *    timeout = the gap); verified equal to the batch result in
  *    StreamingSpec.
  *  - [[hourlyCountsStream]] — the q12 hourly aggregation as a
  *    watermarked streaming windowed agg.
  *
  * Scale shape: both paths shuffle once on user_id; state per key is
  * O(1) (running session accumulator, not buffered events).
  */
object Sessions {

  val GapMs: Long = 30 * 60 * 1000L

  final case class Event(user_id: Long, ts_ms: Long, event_type: String, value: Double)
  final case class SessionOut(user_id: Long, session_start_ms: Long, session_end_ms: Long,
                              n_events: Long, total_value_x100: Long)
  /** public: the state encoder's generated code must reach the accessors */
  final case class SessionState(startMs: Long, endMs: Long, nEvents: Long, totalX100: Long)

  /** Normalize the events table to typed rows (value scaled to integer
    * hundredths so session sums are exact in both engines). */
  def typedEvents(events: DataFrame): Dataset[Event] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_millis(col("ts")).as("ts_ms"),
      col("event_type").cast("string").as("event_type"),
      col("value").cast("double").as("value")).as[Event]
  }

  /** Batch sessionization: a session ends after a >30 min silence. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    typedEvents(events).toDF()
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > GapMs, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("total_value_x100"))
      .drop("session_no")
  }

  /** Streaming sessionization with identical semantics. State per user
    * is one open session; an event past the gap flushes it. The final
    * open sessions flush on stream end (tests) or timeout (production).
    */
  def sessionizeStream(events: Dataset[Event]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // events within one trigger arrive unordered: sort by ts
          val sorted = it.toSeq.sortBy(_.ts_ms)
          var sessions = state.getOption.getOrElse(Nil)
          val closed = List.newBuilder[SessionOut]
          sorted.foreach { e =>
            val x100 = math.round(e.value * 100)
            sessions match {
              case cur :: rest if e.ts_ms - cur.endMs <= GapMs =>
                sessions = SessionState(cur.startMs, math.max(cur.endMs, e.ts_ms), cur.nEvents + 1, cur.totalX100 + x100) :: rest
              case cur :: rest =>
                closed += SessionOut(userId, cur.startMs, cur.endMs, cur.nEvents, cur.totalX100)
                sessions = SessionState(e.ts_ms, e.ts_ms, 1, x100) :: rest
              case Nil =>
                sessions = SessionState(e.ts_ms, e.ts_ms, 1, x100) :: Nil
            }
          }
          state.update(sessions)
          closed.result().iterator
      }
  }

  /** Streaming exact dedup: drop events already seen at the same
    * (user_id, ts) within the watermark horizon — the streaming face of
    * the sink's F5 existence filter. State is bounded by the watermark
    * (Spark evicts seen-keys older than the horizon), which is what
    * makes exact dedup feasible on an unbounded stream. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("user_id", "ts")

  /** Watermarked streaming hourly aggregation (q12's streaming face). */
  def hourlyCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))
}
