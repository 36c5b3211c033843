package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the events/orders streams: gap-filled
  * resampling, event-time rolling aggregates, and overlapping sliding
  * windows (the batch face of the streaming window(...) operator).
  * All values integer-exact (counts / cents) so every row hash-matches
  * DuckDB bit-for-bit.
  */
object TimeSeries {

  /** 7 days in microseconds — the rolling-window reach of q77. */
  private val WeekMicros = 7L * 86400L * 1000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-filled hourly resample: every (event_type, hour) slot in the
    // observed global range, zero-filled where no events landed. The
    // heavy input is collapsed by a partial-aggregable groupBy FIRST;
    // the dense domain (|types| × |hours|) grows with the calendar and
    // the type vocabulary, not with data volume, so the generate+join
    // tail is broadcast-sized at any corpus scale.
    "q76_gap_fill" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      val counts = ev.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"))
      // Dense (type × hour) domain WITHOUT a cross-join node: collapse
      // counts to one row per type, pick up the GLOBAL [lo, hi] via an
      // all-rows window over that |types|-row frame (calendar- and
      // vocabulary-sized, never data-sized), and explode the hour
      // sequence per type. Both domain and counts hang off the same
      // (type, hr) exchange, which ReuseExchange dedupes to one scan.
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val domain = counts.groupBy(col("event_type"))
        .agg(min(col("hr")).as("tlo"), max(col("hr")).as("thi"))
        .withColumn("lo", min(col("tlo")).over(all))
        .withColumn("hi", max(col("thi")).over(all))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hr"))
      domain.join(counts, Seq("event_type", "hr"), "left")
        .select(col("event_type"), col("hr"), coalesce(col("n"), lit(0L)).as("n"))
    },

    // Event-time rolling aggregate: per customer, the count and cents
    // sum of their orders in the trailing 7 days (RANGE frame over the
    // epoch-µs order key, so ties are peers — order-insensitive and
    // engine-portable). One shuffle on the uniform high-cardinality
    // customer key; frame state per task is one window buffer bounded
    // by a single customer's 7-day order burst.
    "q77_rolling" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("tsu"))
        .rangeBetween(-WeekMicros, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("tsu"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .withColumn("roll_n", count(lit(1)).over(w))
        .withColumn("roll_cents", sum(col("cents")).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("roll_n"), col("roll_cents"))
    },

    // Overlapping sliding windows — the batch face of Structured
    // Streaming's window(ts, size, slide): 1-hour windows every 30
    // minutes, counts per event_type. Each row lands in exactly
    // size/slide = 2 windows (epoch-aligned, same convention both
    // engines derive below); the expansion happens map-side and the
    // groupBy is partial-aggregable, so the shuffle carries only
    // (window, type) partials.
    "q78_sliding_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    },

    // PEAK CONCURRENCY per event_type — the sweep-line over intervals
    // [ts, ts + duration): +1/−1 delta points, a running sum, and the
    // max of the running sum is the answer (max concurrent sessions,
    // the capacity-planning number). The textbook single window
    // `ORDER BY t` per type funnels each type through ONE task
    // (|types| is small — the q130 whole-partition-sort hazard), so
    // the running sum is SEGMENTED instead, the GlobalRank
    // decomposition applied to prefix sums: a within-(type, day)
    // window computes local running sums (high-cardinality partitions,
    // parallel), one partial-aggregable rollup yields per-day NET
    // deltas whose prefix sum over the VALUE-DOMAIN-bounded (type,
    // day) table is each day's carry-in, and the carry broadcasts
    // back. Exact: concurrency(t) = carry(day) + local_run(t).
    // End-before-start at the same instant (delta −1 < +1 in the sort)
    // makes touching intervals non-overlapping — the half-open
    // convention. The peak instant reported is the EARLIEST time the
    // peak is reached (deterministic tie-break). Duration derives from
    // `value` through the q80 round(value·100) integer discipline.
    "q158_concurrency" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val iv2 = ev.select(col("event_id"), col("event_type"),
        Tables.tsAsMillis(ev).as("st"),
        greatest(round(col("value") * 100).cast("long"), lit(1L)).as("dur"))
      val del = iv2.select(col("event_type"), col("st").as("t"),
          lit(1L).as("delta"), col("event_id"))
        .unionAll(iv2.select(col("event_type"), (col("st") + col("dur")).as("t"),
          lit(-1L).as("delta"), col("event_id")))
        .withColumn("day", expr("t div 86400000"))
      val wLocal = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("t").asc, col("delta").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = del.withColumn("run_local", sum(col("delta")).over(wLocal))
      val wCarry = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = del.groupBy(col("event_type"), col("day"))
        .agg(sum(col("delta")).as("net")) // (type, day) — value-domain bounded
        .withColumn("carry", coalesce(sum(col("net")).over(wCarry), lit(0L)))
        .select(col("event_type"), col("day"), col("carry"))
      val run = local.join(broadcast(carry), Seq("event_type", "day"))
        .withColumn("conc", col("carry") + col("run_local"))
      val peak = run.groupBy(col("event_type")).agg(max(col("conc")).as("peak_conc"))
      run.join(broadcast(peak), Seq("event_type"))
        .filter(col("conc") === col("peak_conc"))
        .groupBy(col("event_type"), col("peak_conc"))
        .agg(min(col("t")).as("peak_at_ms"))
        .select(col("event_type"), col("peak_conc"), col("peak_at_ms"))
    }
  )

  val oracle: Map[String, String] = Map(

    "q76_gap_fill" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS hr FROM events),
           b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM ev),
           hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b),
           types AS (SELECT DISTINCT event_type FROM ev),
           counts AS (SELECT event_type, hr, count(*) AS n FROM ev GROUP BY 1, 2)
         SELECT t.event_type, h.hr, coalesce(c.n, 0)::BIGINT AS n
         FROM types t CROSS JOIN hours h
         LEFT JOIN counts c ON c.event_type = t.event_type AND c.hr = h.hr""",

    "q77_rolling" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS tsu,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM orders)
         SELECT o_orderkey, o_custkey,
           count(*) OVER w AS roll_n,
           (sum(cents) OVER w)::BIGINT AS roll_cents
         FROM t
         WINDOW w AS (PARTITION BY o_custkey ORDER BY tsu
           RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""",

    // Spark's window(ts, 1h, 30m) is epoch-aligned: a row at epoch-µs e
    // is in the windows starting at (e - e % slide) and that minus one
    // slide. Recomputed literally.
    "q78_sliding_window" ->
      """WITH ev AS (SELECT epoch_us(ts) AS e, event_type FROM events),
           x AS (SELECT event_type,
                   unnest([e - e % 1800000000, e - e % 1800000000 - 1800000000]) AS ws
                 FROM ev)
         SELECT make_timestamp(ws) AS w_start, event_type, count(*)::BIGINT AS n
         FROM x GROUP BY 1, 2""",

    // the un-segmented textbook sweep (one window per type) — fine at
    // oracle scale, and a structural cross-check of the engine's
    // segmented carry-in decomposition
    "q158_concurrency" ->
      """WITH iv AS (SELECT event_id, event_type, epoch_ms(ts)::BIGINT AS st,
             greatest(round(value * 100)::BIGINT, 1) AS dur
           FROM events),
          d AS (SELECT event_type, st AS t, 1 AS delta, event_id FROM iv
                UNION ALL
                SELECT event_type, st + dur, -1, event_id FROM iv),
          r AS (SELECT event_type, t,
                  sum(delta) OVER (PARTITION BY event_type
                    ORDER BY t, delta, event_id)::BIGINT AS run
                FROM d),
          m AS (SELECT event_type, max(run)::BIGINT AS peak_conc
                FROM r GROUP BY 1)
         SELECT r.event_type, m.peak_conc, min(r.t)::BIGINT AS peak_at_ms
         FROM r JOIN m ON r.event_type = m.event_type AND r.run = m.peak_conc
         GROUP BY 1, 2"""
  )
}
