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
    },

    // CUSUM CHANGEPOINT DETECTION per event_type over the gap-filled
    // hourly count series (dead hours are real negative deviations —
    // the zero-fill is load-bearing). The recursive textbook form
    // s_t = max(0, s_{t−1} + (x_t − μ)) is NOT a window scan, but its
    // closed form is: s_t = p_t − min(0, min_{j≤t} p_j) with p the
    // plain prefix sum of deviations — two window passes, no
    // recursion. Exact arithmetic at ×n_hours scale (dev_t = n·x_t −
    // Σx clears the mean's denominator); alarm threshold h = 2·Σx
    // (a cumulative excess of two mean-hours). Shapes: the data-sized
    // pass is one partial-aggregable (type, hour) count; every window
    // runs on the calendar-bounded per-type hour series. No-alarm
    // sentinel is −1, never NULL (the gate's sort can't take NaN).
    "q174_cusum" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val counts = ev.select(col("event_type"), Tables.tsAsMillis(ev).as("ms"))
        .withColumn("e", expr("ms div 3600000"))
        .groupBy(col("event_type"), col("e")).agg(count(lit(1)).as("x"))
      val dense = counts.groupBy(col("event_type"))
        .agg(min(col("e")).as("lo"), max(col("e")).as("hi"),
          count(lit(1)).as("nnz"), sum(col("x")).as("sx"))
        .withColumn("nh", col("hi") - col("lo") + 1L)
        .select(col("event_type"), col("nh"), col("sx"),
          explode(sequence(col("lo"), col("hi"))).as("e"))
        .join(counts, Seq("event_type", "e"), "left")
        .withColumn("x", coalesce(col("x"), lit(0L)))
      val wRun = Window.partitionBy(col("event_type")).orderBy(col("e").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cusum = dense
        .withColumn("p", sum(col("nh") * col("x") - col("sx")).over(wRun))
        .withColumn("s", col("p") - least(min(col("p")).over(wRun), lit(0L)))
        .withColumn("alarm", col("s") > lit(2L) * col("sx"))
      val per = cusum.groupBy(col("event_type"))
        .agg(max(col("nh")).as("n_hours"),
          expr("(100 * max(sx)) div max(nh)").as("mean_x100"),
          max(col("s")).as("peak_s"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
          coalesce(min(when(col("alarm"), col("e"))), lit(-1L)).as("first_alarm_e"))
      val att = cusum.select(col("event_type").as("et2"), col("e"), col("s"))
      per.join(broadcast(att),
          per("event_type") === col("et2") && per("peak_s") === col("s"))
        .groupBy(col("event_type"), col("n_hours"), col("mean_x100"),
          col("peak_s"), col("n_alarms"), col("first_alarm_e"))
        .agg(min(col("e")).as("peak_e"))
        .select(col("event_type"), col("n_hours"), col("mean_x100"),
          col("peak_s"), col("peak_e"), col("n_alarms"), col("first_alarm_e"))
    },

    // AUTOCORRELATION FUNCTION at lags 1..12 h per event_type over the
    // same gap-filled hourly series — the periodicity detector (a
    // daily cycle shows as a ridge at lag 24; traffic burstiness as
    // fast decay). Exact: centered at ×n scale (c_t = n·x_t − Σx),
    // r_k·10⁶ = 10⁶·Σ c_t·c_{t+k} div Σ c_t² by integral divide
    // (truncation toward zero in BOTH engines — the house q162
    // convention). The lag pairing is a self-equi-join on (type,
    // hour+k) over the calendar-bounded dense series — never a
    // data-sized shuffle; the 12-lag explode multiplies only that
    // bounded table.
    "q175_acf" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val counts = ev.select(col("event_type"), Tables.tsAsMillis(ev).as("ms"))
        .withColumn("e", expr("ms div 3600000"))
        .groupBy(col("event_type"), col("e")).agg(count(lit(1)).as("x"))
      val dense = counts.groupBy(col("event_type"))
        .agg(min(col("e")).as("lo"), max(col("e")).as("hi"), sum(col("x")).as("sx"))
        .withColumn("nh", col("hi") - col("lo") + 1L)
        .select(col("event_type"), col("nh"), col("sx"),
          explode(sequence(col("lo"), col("hi"))).as("e"))
        .join(counts, Seq("event_type", "e"), "left")
        .withColumn("c", col("nh") * coalesce(col("x"), lit(0L)) - col("sx"))
        .select(col("event_type"), col("e"), col("c"))
      val den = dense.groupBy(col("event_type"))
        .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("den"))
      val lagged = dense.select(col("event_type"),
          explode(expr("sequence(1, 12)")).as("lag"), col("e"), col("c").as("c2"))
        .select(col("event_type"), col("lag"), (col("e") - col("lag")).as("e"),
          col("c2"))
      dense.join(lagged, Seq("event_type", "e"))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c2")).as("num"))
        .join(broadcast(den), Seq("event_type"))
        .withColumn("r_x1e6", expr(
          "CASE WHEN den = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE CAST((1000000 * num) div den AS BIGINT) END"))
        .select(col("event_type"), col("lag").cast("long").as("lag"),
          col("n_pairs"), col("r_x1e6"))
    },

    // SEASONAL DECOMPOSITION (STL-lite): detrend the gap-filled hourly
    // series with a centered 25-hour moving average (full frames only),
    // then average the residual by UTC hour-of-day — the additive
    // seasonal profile (which hours run hot once the trend is
    // removed). Exact at ×25 scale: d25_t = 25·x_t − Σ_{|j−t|≤12} x_j;
    // seasonal·100 = (100·Σ d25) div (25·n_obs) per (type, hod).
    // hour-of-day = epoch-hour mod 24 — raw integer arithmetic,
    // never an engine calendar function. Same bounded-window shapes
    // as q174/q175.
    "q177_seasonal" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val counts = ev.select(col("event_type"), Tables.tsAsMillis(ev).as("ms"))
        .withColumn("e", expr("ms div 3600000"))
        .groupBy(col("event_type"), col("e")).agg(count(lit(1)).as("x"))
      val dense = counts.groupBy(col("event_type"))
        .agg(min(col("e")).as("lo"), max(col("e")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("e"))
        .join(counts, Seq("event_type", "e"), "left")
        .withColumn("x", coalesce(col("x"), lit(0L)))
      val wMa = Window.partitionBy(col("event_type")).orderBy(col("e").asc)
        .rowsBetween(-12, 12)
      dense
        .withColumn("wn", count(lit(1)).over(wMa))
        .withColumn("wsum", sum(col("x")).over(wMa))
        .filter(col("wn") === 25L) // full centered frames only
        .withColumn("d25", lit(25L) * col("x") - col("wsum"))
        .withColumn("hod", expr("e % 24"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n_obs"), sum(col("d25")).as("ssum"))
        .withColumn("seasonal_x100", expr("(100 * ssum) div (25 * n_obs)"))
        .select(col("event_type"), col("hod"), col("n_obs"), col("seasonal_x100"))
    },

    // CROSS-CORRELATION (CCF) of every event type against the
    // reference type's hourly series at lags −12..+12 — the lead/lag
    // detector (does type B's traffic FOLLOW type A's by k hours?).
    // Same exact arithmetic as q175's ACF generalized to two series:
    // both series center at the ×(na·nb) common scale implicitly by
    // clearing denominators — r_k·10⁶ = 10⁶·Σ cₐ(t)·c_b(t+k) div
    // √(Σcₐ²·Σc_b²) needs a square root, so the report ships the
    // exact num and the two den factors plus the SIGNED SQUARED
    // r²·10¹² (the q171 discipline). The reference series is the
    // lexicographically first event type — data-derived, no fixture
    // constant. Shapes: identical to q175 — one partial-aggregable
    // count, then everything on the calendar-bounded dense grid.
    "q180_ccf" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val counts = ev.select(col("event_type"), Tables.tsAsMillis(ev).as("ms"))
        .withColumn("e", expr("ms div 3600000"))
        .groupBy(col("event_type"), col("e")).agg(count(lit(1)).as("x"))
      // common hour span: the GLOBAL [lo, hi] so both series align
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val dense = counts.groupBy(col("event_type"))
        .agg(min(col("e")).as("tlo"), max(col("e")).as("thi"), sum(col("x")).as("sx"))
        .withColumn("lo", min(col("tlo")).over(all))
        .withColumn("hi", max(col("thi")).over(all))
        .withColumn("nh", col("hi") - col("lo") + 1L)
        .select(col("event_type"), col("nh"), col("sx"),
          explode(sequence(col("lo"), col("hi"))).as("e"))
        .join(counts, Seq("event_type", "e"), "left")
        .withColumn("c", col("nh") * coalesce(col("x"), lit(0L)) - col("sx"))
        .select(col("event_type"), col("e"), col("c"))
      val den = dense.groupBy(col("event_type"))
        .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("den"))
      val refType = den.agg(min(col("event_type"))).collect()(0).getString(0)
      val ref = dense.filter(col("event_type") === refType)
        .select(col("e"), col("c").as("ca"))
      val refDen = den.filter(col("event_type") === refType)
        .select(col("den").as("den_a"))
      val lagged = dense.filter(col("event_type") =!= refType)
        .select(col("event_type"),
          explode(expr("sequence(-12, 12)")).as("lag"), col("e"), col("c"))
        .select(col("event_type"), col("lag"), (col("e") - col("lag")).as("e"),
          col("c").as("cb"))
      ref.join(lagged, Seq("e"))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("num"))
        .join(broadcast(den), Seq("event_type")).crossJoin(broadcast(refDen))
        .withColumn("r2s_x1e12", expr(
          "CASE WHEN den = 0 OR den_a = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END * " +
            "((num * num * 1000000000000) div (den_a * den)) AS BIGINT) END"))
        .select(col("event_type"), col("lag").cast("long").as("lag"),
          col("n_pairs"), col("num").cast("long").as("ccf_num"), col("r2s_x1e12"))
    },

    // TEMPORAL INTERVAL COALESCE (gaps-and-islands over INTERVALS):
    // merge every overlapping-or-touching [st, st+dur) busy period per
    // event_type into maximal islands — SQL:2011's temporal coalesce,
    // the normalizer behind q158's concurrency sweep (q25 sessionizes
    // POINTS by gap; this merges DURATIONS by overlap). The textbook
    // form needs two sequential scans (running max of prior ends → new-
    // island flags → running flag count); both decompose by the q158
    // segmented-carry pattern: within-(type, start-day) windows do the
    // local running max / flag count in parallel, the (type, day)
    // rollup's prefix max/sum over the VALUE-DOMAIN-bounded day table
    // is each day's carry-in, and greatest(local, carry) is exact —
    // intervals spanning days are covered because the end-max carry
    // crosses day boundaries. Output: one row per island (start, end,
    // n_merged, span_ms). Touching intervals (st = prior end) MERGE —
    // the closed-coalesce convention, the complement of q158's
    // half-open counting.
    "q191_interval_coalesce" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val iv = ev.select(col("event_type"), col("event_id"),
          Tables.tsAsMillis(ev).as("st"),
          greatest(round(col("value") * 100).cast("long"), lit(1L)).as("dur"))
        .withColumn("en", col("st") + col("dur"))
        .withColumn("day", expr("st div 86400000"))
      val wLocalPrev = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("st").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val dayAgg = iv.groupBy(col("event_type"), col("day"))
        .agg(max(col("en")).as("day_max"), count(lit(1)).as("day_n"))
      val wCarry = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = dayAgg
        .withColumn("carry_max", max(col("day_max")).over(wCarry))
        .select(col("event_type"), col("day"), col("carry_max"))
      val flagged = iv.join(broadcast(carry), Seq("event_type", "day"))
        .withColumn("local_prev", max(col("en")).over(wLocalPrev))
        .withColumn("prior_end", greatest(
          coalesce(col("local_prev"), lit(Long.MinValue)),
          coalesce(col("carry_max"), lit(Long.MinValue))))
        .withColumn("flag",
          when(col("st") > col("prior_end"), 1L).otherwise(0L))
      val wLocalFlags = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("st").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dayFlags = flagged.groupBy(col("event_type"), col("day"))
        .agg(sum(col("flag")).as("day_flags"))
        .withColumn("flag_carry", coalesce(sum(col("day_flags")).over(wCarry), lit(0L)))
        .select(col("event_type"), col("day"), col("flag_carry"))
      flagged.join(broadcast(dayFlags), Seq("event_type", "day"))
        .withColumn("island", col("flag_carry") + sum(col("flag")).over(wLocalFlags))
        .groupBy(col("event_type"), col("island"))
        .agg(min(col("st")).as("island_start"), max(col("en")).as("island_end"),
          count(lit(1)).as("n_merged"))
        .withColumn("span_ms", col("island_end") - col("island_start"))
        .select(col("event_type"), col("island"), col("island_start"),
          col("island_end"), col("n_merged"), col("span_ms"))
    },

    // HOLT LINEAR-TREND FORECAST — the family's missing face: q174
    // detects a shift, q175/q177 decompose; this EXTRAPOLATES. Double
    // exponential smoothing (α=1/5, β=1/10) over the q174 gap-filled
    // hourly series, entirely in ×10⁶ fixed point with truncating
    // integer division so both engines run the identical chain:
    //   l_t = (2·y_t·10⁶ + 8·(l_{t−1}+b_{t−1})) div 10
    //   b_t = ((l_t − l_{t−1}) + 9·b_{t−1}) div 10,  l_1 = y_1·10⁶, b_1 = 0
    //   ŷ_{T+h} = l_T + h·b_T,  h = 1..6
    // Distribution: the corpus-sized work is ONE partial-aggregable
    // hourly count; the recurrence is inherently sequential, so it
    // folds driver-side over the CALENDAR-BOUNDED dense series
    // (|types|·|hours| rows — the q189/q197 bounded-fold class, never
    // corpus-sized). The oracle unrolls the same chain with a
    // recursive CTE.
    "q224_holt_forecast" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val counts = ev.select(col("event_type"), Tables.tsAsMillis(ev).as("ms"))
        .withColumn("e", expr("ms div 3600000"))
        .groupBy(col("event_type"), col("e")).agg(count(lit(1)).as("x"))
      val dense = counts.groupBy(col("event_type"))
        .agg(min(col("e")).as("lo"), max(col("e")).as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("e"))
        .join(counts, Seq("event_type", "e"), "left")
        .withColumn("x", coalesce(col("x"), lit(0L)))
      val series = dense.select(col("event_type"), col("e"), col("x"))
        .collect().groupBy(_.getString(0))
      val out = series.toSeq.flatMap { case (et, rows) =>
        val xs = rows.sortBy(_.getLong(1)).map(_.getLong(2))
        var l = xs.head * 1000000L
        var b = 0L
        xs.tail.foreach { y =>
          val lNew = (2L * y * 1000000L + 8L * (l + b)) / 10L
          b = ((lNew - l) + 9L * b) / 10L // Long / = div: trunc toward 0, both engines
          l = lNew
        }
        (1 to 6).map(h => (et, xs.length.toLong, h.toLong, l + h * b))
      }
      val sp = s; import sp.implicits._
      out.toDF("event_type", "n_hours", "h", "yhat_x1e6")
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
         GROUP BY 1, 2""",

    "q174_cusum" ->
      """WITH cnt AS (SELECT event_type, epoch_ms(ts) // 3600000 AS e,
             count(*)::BIGINT AS x
           FROM events GROUP BY 1, 2),
          b AS (SELECT event_type, min(e) AS lo, max(e) AS hi,
                  sum(x)::BIGINT AS sx FROM cnt GROUP BY 1),
          dense AS (SELECT event_type, (hi - lo + 1)::BIGINT AS nh, sx,
                      unnest(generate_series(lo, hi)) AS e
                    FROM b),
          dj AS (SELECT d.event_type, d.nh, d.sx, d.e,
                   coalesce(c.x, 0)::BIGINT AS x
                 FROM dense d LEFT JOIN cnt c
                   ON c.event_type = d.event_type AND c.e = d.e),
          run AS (SELECT *, sum(nh * x - sx) OVER
                    (PARTITION BY event_type ORDER BY e) AS p
                  FROM dj),
          sc AS (SELECT *, p - least(min(p) OVER
                   (PARTITION BY event_type ORDER BY e), 0) AS s
                 FROM run),
          al AS (SELECT *, s > 2 * sx AS alarm FROM sc),
          per AS (SELECT event_type, max(nh)::BIGINT AS n_hours,
                    ((100 * max(sx)) // max(nh))::BIGINT AS mean_x100,
                    max(s)::BIGINT AS peak_s,
                    sum(CASE WHEN alarm THEN 1 ELSE 0 END)::BIGINT AS n_alarms,
                    coalesce(min(CASE WHEN alarm THEN e END), -1)::BIGINT
                      AS first_alarm_e
                  FROM al GROUP BY 1)
         SELECT per.event_type, n_hours, mean_x100, peak_s,
                min(al.e)::BIGINT AS peak_e, n_alarms, first_alarm_e
         FROM per JOIN al ON al.event_type = per.event_type
           AND al.s = per.peak_s
         GROUP BY 1, 2, 3, 4, 6, 7""",

    "q175_acf" ->
      """WITH cnt AS (SELECT event_type, epoch_ms(ts) // 3600000 AS e,
             count(*)::BIGINT AS x
           FROM events GROUP BY 1, 2),
          b AS (SELECT event_type, min(e) AS lo, max(e) AS hi,
                  sum(x)::BIGINT AS sx FROM cnt GROUP BY 1),
          dense AS (SELECT event_type, (hi - lo + 1)::BIGINT AS nh, sx,
                      unnest(generate_series(lo, hi)) AS e
                    FROM b),
          dj AS (SELECT d.event_type, d.e,
                   (d.nh * coalesce(c.x, 0) - d.sx)::BIGINT AS c
                 FROM dense d LEFT JOIN cnt c
                   ON c.event_type = d.event_type AND c.e = d.e),
          den AS (SELECT event_type, sum(c::HUGEINT * c) AS den
                  FROM dj GROUP BY 1),
          lags AS (SELECT unnest(generate_series(1, 12)) AS lag),
          pairs AS (SELECT a.event_type, l.lag, a.c AS c1, b2.c AS c2
                    FROM dj a CROSS JOIN lags l
                    JOIN dj b2 ON b2.event_type = a.event_type
                      AND b2.e = a.e + l.lag)
         SELECT p.event_type, p.lag::BIGINT AS lag,
                count(*)::BIGINT AS n_pairs,
                (CASE WHEN den.den = 0 THEN 0
                      ELSE (1000000 * sum(p.c1::HUGEINT * p.c2)) // den.den
                 END)::BIGINT AS r_x1e6
         FROM pairs p JOIN den ON den.event_type = p.event_type
         GROUP BY 1, 2, den.den""",

    "q177_seasonal" ->
      """WITH cnt AS (SELECT event_type, epoch_ms(ts) // 3600000 AS e,
             count(*)::BIGINT AS x
           FROM events GROUP BY 1, 2),
          b AS (SELECT event_type, min(e) AS lo, max(e) AS hi
                FROM cnt GROUP BY 1),
          dense AS (SELECT event_type, unnest(generate_series(lo, hi)) AS e
                    FROM b),
          dj AS (SELECT d.event_type, d.e, coalesce(c.x, 0)::BIGINT AS x
                 FROM dense d LEFT JOIN cnt c
                   ON c.event_type = d.event_type AND c.e = d.e),
          ma AS (SELECT *, count(*) OVER w AS wn, sum(x) OVER w AS wsum
                 FROM dj
                 WINDOW w AS (PARTITION BY event_type ORDER BY e
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
          det AS (SELECT event_type, e % 24 AS hod, 25 * x - wsum AS d25
                  FROM ma WHERE wn = 25)
         SELECT event_type, hod::BIGINT AS hod, count(*)::BIGINT AS n_obs,
                ((100 * sum(d25)) // (25 * count(*)))::BIGINT AS seasonal_x100
         FROM det GROUP BY 1, 2""",

    // the textbook two-scan island detection, one window per type —
    // the un-segmented mirror of the engine's carry decomposition
    "q191_interval_coalesce" ->
      """WITH iv AS (SELECT event_type, event_id, epoch_ms(ts)::BIGINT AS st,
             greatest(round(value * 100)::BIGINT, 1) AS dur
           FROM events),
          x AS (SELECT event_type, event_id, st, st + dur AS en FROM iv),
          f AS (SELECT *, CASE WHEN st > coalesce(max(en) OVER (
                  PARTITION BY event_type ORDER BY st, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -9223372036854775807) THEN 1 ELSE 0 END AS flag
                FROM x),
          g AS (SELECT *, sum(flag) OVER (PARTITION BY event_type
                  ORDER BY st, event_id)::BIGINT AS island
                FROM f)
         SELECT event_type, island, min(st)::BIGINT AS island_start,
                max(en)::BIGINT AS island_end, count(*)::BIGINT AS n_merged,
                (max(en) - min(st))::BIGINT AS span_ms
         FROM g GROUP BY 1, 2""",

    // the oracle UNROLLS the identical ×10⁶ truncating chain with a
    // recursive CTE over the same gap-filled hourly series
    "q224_holt_forecast" ->
      """WITH RECURSIVE
          cnt AS (SELECT event_type, epoch_ms(ts) // 3600000 AS e,
             count(*)::BIGINT AS x
           FROM events GROUP BY 1, 2),
          b AS (SELECT event_type, min(e) AS lo, max(e) AS hi FROM cnt GROUP BY 1),
          dense0 AS (SELECT b.event_type, b.lo,
                       unnest(generate_series(b.lo, b.hi)) AS e
                     FROM b),
          dense AS (SELECT d.event_type, (d.e - d.lo + 1)::BIGINT AS rn,
                      coalesce(c.x, 0)::BIGINT AS x
                    FROM dense0 d LEFT JOIN cnt c
                      ON c.event_type = d.event_type AND c.e = d.e),
          rec AS (
            SELECT event_type, rn, (x * 1000000)::BIGINT AS l, 0::BIGINT AS bb
            FROM dense WHERE rn = 1
            UNION ALL
            SELECT d.event_type, d.rn,
              ((2 * d.x * 1000000 + 8 * (r.l + r.bb)) // 10)::BIGINT,
              ((((2 * d.x * 1000000 + 8 * (r.l + r.bb)) // 10) - r.l
                 + 9 * r.bb) // 10)::BIGINT
            FROM rec r JOIN dense d
              ON d.event_type = r.event_type AND d.rn = r.rn + 1),
          last AS (SELECT r.event_type, r.rn, r.l, r.bb
                   FROM rec r JOIN (SELECT event_type, max(rn) AS m
                                    FROM rec GROUP BY 1) t
                     ON r.event_type = t.event_type AND r.rn = t.m)
         SELECT l.event_type, l.rn AS n_hours, h.h::BIGINT AS h,
                (l.l + h.h * l.bb)::BIGINT AS yhat_x1e6
         FROM last l, (SELECT unnest([1, 2, 3, 4, 5, 6]) AS h) h""",

    "q180_ccf" ->
      """WITH cnt AS (SELECT event_type, epoch_ms(ts) // 3600000 AS e,
             count(*)::BIGINT AS x
           FROM events GROUP BY 1, 2),
          b AS (SELECT event_type, min(e) AS tlo, max(e) AS thi,
                  sum(x)::BIGINT AS sx FROM cnt GROUP BY 1),
          g AS (SELECT min(tlo) AS lo, max(thi) AS hi FROM b),
          dense AS (SELECT b.event_type, (g.hi - g.lo + 1)::BIGINT AS nh, b.sx,
                      unnest(generate_series(g.lo, g.hi)) AS e
                    FROM b, g),
          dj AS (SELECT d.event_type, d.e,
                   (d.nh * coalesce(c.x, 0) - d.sx)::BIGINT AS c
                 FROM dense d LEFT JOIN cnt c
                   ON c.event_type = d.event_type AND c.e = d.e),
          den AS (SELECT event_type, sum(c::HUGEINT * c) AS den
                  FROM dj GROUP BY 1),
          rt AS (SELECT min(event_type) AS r FROM den),
          ref AS (SELECT dj.e, dj.c AS ca FROM dj, rt
                  WHERE dj.event_type = rt.r),
          dena AS (SELECT den.den AS den_a FROM den, rt
                   WHERE den.event_type = rt.r),
          lags AS (SELECT unnest(generate_series(-12, 12)) AS lag),
          pr AS (SELECT b2.event_type, l.lag, ref.ca, b2.c AS cb
                 FROM ref CROSS JOIN lags l
                 JOIN dj b2 ON b2.e = ref.e + l.lag, rt
                 WHERE b2.event_type <> rt.r)
         SELECT p.event_type, p.lag::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
                sum(p.ca::HUGEINT * p.cb)::BIGINT AS ccf_num,
                (CASE WHEN den.den = 0 OR dena.den_a = 0 THEN 0
                      ELSE (CASE WHEN sum(p.ca::HUGEINT * p.cb) < 0
                              THEN -1 ELSE 1 END)
                           * ((sum(p.ca::HUGEINT * p.cb)
                               * sum(p.ca::HUGEINT * p.cb) * 1000000000000)
                              // (dena.den_a * den.den)) END)::BIGINT AS r2s_x1e12
         FROM pr p JOIN den ON den.event_type = p.event_type, dena
         GROUP BY 1, 2, den.den, dena.den_a"""
  )
}
