package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral event analytics: ordered funnel conversion and retention
  * cohorts over the events stream — the product-analytics operator
  * class (sessionization's siblings; q25/q52 cover sessions). All
  * timestamps ride as integer epoch microseconds on both engines
  * (Spark TimestampType IS µs; DuckDB `epoch_us`) so boundary rows
  * can't drift, and day/window arithmetic is integer division.
  */
object Behavior {

  // funnel conversion window per stage: 24 h in µs
  private val WinUs = 86400000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Ordered funnel (signup → click → purchase, each within 24 h of
    // the previous stage): per-stage minimum timestamps with STRICT
    // ordering — t2 is the first click AFTER t1, t3 the first purchase
    // after t2. The per-stage relational shape (filter → groupBy →
    // join) beats a per-user collect-and-walk at scale: event_type
    // predicates push into the scan, every shuffle is on the uniform
    // user_id, and each stage's aggregate is partial — no per-user
    // event buffer exists anywhere. events is scanned once per stage
    // (with its stage filter pushed) — the irreducible cost of the
    // sequential dependency. s1/s2 feed TWO consumers each (the next
    // stage and the final assembly), and the pushed isnotnull filters
    // on the joined instances defeat exchange canonicalization, so
    // without a checkpoint every stage subtree re-executes (measured:
    // 10 events scans, 9 exchanges); the per-user stage tables are
    // |users|-sized, so materializing them is cheap insurance.
    "q66_funnel" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1_us"))
        .localCheckpoint()
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("us") > col("t1_us") && col("us") <= col("t1_us") + WinUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("t2_us"))
        .localCheckpoint()
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("us") > col("t2_us") && col("us") <= col("t2_us") + WinUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("t3_us"))
      s1.join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
          when(col("t3_us").isNotNull, 1).otherwise(0).as("converted"))
    },

    // Retention cohorts: users grouped by the day of their FIRST event,
    // counted distinct per (cohort day, days-since-cohort) — the
    // classic retention triangle. Two shuffles on user_id (first-event
    // aggregate, then the enriching join reuses that partitioning) plus
    // the final small aggregate on (cohort_day, day_offset) — a
    // bounded-cardinality key at any data size, since it grows with the
    // calendar, not the data.
    "q67_retention" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val firsts = ev.groupBy(col("user_id")).agg(min(col("us")).as("first_us"))
      ev.join(firsts, "user_id")
        .select(col("user_id"),
          expr("first_us div 86400000000").as("cohort_day"),
          expr("us div 86400000000 - first_us div 86400000000").as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },

    // Semi-structured column processing: extract a typed field from the
    // JSON `props` column and aggregate it — the schema-on-read path
    // every event pipeline needs. `get_json_object` is codegen'd
    // (Jackson under the hood) and the extraction is a narrow map
    // before a partial-aggregable groupBy on the 5-value event_type;
    // at open scale the extraction cost dominates and parallelizes
    // per-row, so there is nothing to shuffle but the tiny aggregate.
    // For a STABLE high-volume schema the scale upgrade is
    // from_json with an explicit schema projected at the scan — kept
    // get_json_object here because single-field extraction is the
    // dominant ad-hoc shape.
    "q68_json_props" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
    },

    // ASSOCIATION RULES over order baskets (market-basket analysis,
    // the Apriori support/confidence/lift triple in exact integers):
    // baskets = orders' distinct part sets, candidate pairs generated
    // by the ORDER-key self-join (fan-out bounded by order size, the
    // q153 edge-build shape — never itemset enumeration), a
    // data-derived support floor prunes both items and pairs before
    // any rule math, and each surviving pair yields its two directed
    // rules with confidence·10³ = n_ab/n_a and lift·10⁶ =
    // n_ab·N/(n_a·n_b) as integral divides. Shapes: one bounded-fan
    // self-join + partial-aggregable counts; the rule table is
    // support-pruned, never pair-complete.
    "q163_assoc_rules" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
        .localCheckpoint() // reused: basket count, item counts, pair gen
      val nBaskets = li.select(col("ok")).distinct().count()
      val minSup = math.max(nBaskets / 1000L, 5L) // data-derived floor
      val items = li.groupBy(col("p")).agg(count(lit(1)).as("n_i"))
        .filter(col("n_i") >= minSup)
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= minSup)
      val ia = items.select(col("p").as("pa"), col("n_i").as("n_a"))
      val ib = items.select(col("p").as("pb"), col("n_i").as("n_b"))
      val joined = pairs.join(ia, "pa").join(ib, "pb")
      val ab = joined.select(col("pa").as("ante"), col("pb").as("cons"),
        col("n_a"), col("n_b"), col("n_ab"))
      val ba = joined.select(col("pb").as("ante"), col("pa").as("cons"),
        col("n_b").as("n_a"), col("n_a").as("n_b"), col("n_ab"))
      ab.unionAll(ba)
        .withColumn("conf_x1000", expr("1000 * n_ab div n_a"))
        // DECIMAL(38) intermediates: 10⁶·n_ab·N outgrows int64 at
        // corpus scale (the q152/q162 discipline)
        .withColumn("lift_x1e6", expr(
          s"CAST((1000000 * CAST(n_ab AS DECIMAL(38,0)) * $nBaskets) div " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
        .filter(col("conf_x1000") >= 100) // 10% confidence floor
        .select(col("ante"), col("cons"), col("n_a"), col("n_b"),
          col("n_ab"), col("conf_x1000"), col("lift_x1e6"))
    },

    // LAST-TOUCH ATTRIBUTION — every purchase credited to the user's
    // most recent click within a 7-day lookback (the marketing-
    // attribution primitive; first/linear variants are the same plan
    // with a different pick). Riding the q32 as-of operator: ONE
    // union + per-user window, no join node, no range explosion — the
    // purchase stream never shuffles twice. Clicks collapse to unique
    // (user, ts) first (max event_id wins the tie, q32's determinism
    // contract); the lookback gate is a narrow post-filter, so
    // out-of-window purchases ship explicitly unattributed (-1), never
    // silently dropped. Scale: the window partitions on user_id — the
    // natural high-cardinality key.
    "q166_attribution" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val base = ev.select(col("event_id"), col("user_id"),
        col("event_type"), Tables.tsAsMillis(ev).as("t"))
      val buys = base.filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id"), col("t").as("buy_ms"))
      val clicks = base.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("t").as("click_ms"))
        .agg(max(col("event_id")).as("click_id"))
      val wk = 7L * 86400000L
      graft.operators.AsOfJoin.asOf(buys, clicks, key = "user_id",
          leftTs = "buy_ms", rightTs = "click_ms",
          payload = Seq("click_id", "click_ms"))
        .withColumn("in_window",
          col("click_ms").isNotNull && col("buy_ms") - col("click_ms") <= wk)
        .select(col("buy_id"), col("user_id"), col("buy_ms"),
          when(col("in_window"), col("click_id")).otherwise(lit(-1L)).as("att_click_id"),
          when(col("in_window"), col("buy_ms") - col("click_ms")).otherwise(lit(-1L)).as("gap_ms"))
    },

    // SEQUENTIAL PATTERN MINING (PrefixSpan-lite, length 3): the most
    // frequent consecutive event-type trigrams across user journeys —
    // the "next-step prediction" table product analytics builds (q163
    // mines UNORDERED baskets; this mines ORDER). Each user's timeline
    // orders by (ts, event_id) — the deterministic tie-break — and
    // consecutive triples count once per occurrence; support ≥ 5
    // prunes before ranking. Shapes: ONE shuffle on the
    // high-cardinality user key powers the lead() windows (each task
    // holds one user's run); trigram counting partial-aggregates over
    // the |types|³-bounded key space; top-20 is TakeOrdered.
    "q188_sequence_mining" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val base = ev.select(col("user_id"), col("event_type"),
        Tables.tsAsMillis(ev).as("t"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t").asc, col("event_id").asc)
      val tri = base
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .groupBy(col("event_type").as("e1"), col("t2").as("e2"), col("t3").as("e3"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // reused: the total scalar + the ranked report
      val total = tri.agg(coalesce(sum(col("cnt")), lit(0L))).collect()(0).getLong(0)
      tri.filter(col("cnt") >= 5L)
        .orderBy(col("cnt").desc, col("e1").asc, col("e2").asc, col("e3").asc)
        .limit(20)
        .withColumn("rank", row_number().over(Window.orderBy(
          col("cnt").desc, col("e1").asc, col("e2").asc, col("e3").asc)).cast("long"))
        .withColumn("support_x1e6", expr(s"(1000000 * cnt) div ${total}L"))
        .select(col("rank"), col("e1"), col("e2"), col("e3"), col("cnt"),
          col("support_x1e6"))
    },

    // KAPLAN–MEIER SURVIVAL CURVE of order-to-first-ship time per
    // order priority: subject = order, event ("death") = first
    // lineitem shipped, duration = days from order date to first ship
    // (clamped at 0 — the synthetic dates are uncorrelated), with
    // ADMINISTRATIVE CENSORING at the end of order intake (an order
    // whose first ship falls after the last order date leaves the
    // risk set unshipped — the standard right-censoring every
    // time-to-event study carries). S(t) multiplies (n_t − d_t)/n_t
    // over death days — an inherently SEQUENTIAL product of
    // rationals, kept exact as the stepwise integral divide
    // s ← (s·(n−d)) div n at ×10⁶ scale. The step table is
    // date-domain bounded (≤ span-days rows per cohort), so the fold
    // rides one bounded driver collect (the q165 scalar class) while
    // every data-sized pass — the first-ship aggregate, the
    // (cohort, duration) counts, the reverse-cumulative risk set — is
    // a partial-aggregable shuffle or a bounded-table window. The
    // ORACLE walks the same recurrence as a linear recursive CTE — an
    // iterative fixpoint cross-checking a driver fold (the q148
    // discipline).
    "q189_kaplan_meier" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderpriority").as("cohort"),
        expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000").as("od"))
      val fs = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(min(expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000"))
          .as("sd"))
      val j = o.join(fs, Seq("o_orderkey")).localCheckpoint()
      val cDay = j.agg(max(col("od"))).collect()(0).getLong(0)
      val lives = j
        .withColumn("died", col("sd") <= lit(cDay))
        .withColumn("dur", when(col("died"),
          greatest(col("sd") - col("od"), lit(0L)))
          .otherwise(greatest(lit(cDay) - col("od"), lit(0L))))
      val steps = lives.groupBy(col("cohort"), col("dur"))
        .agg(count(lit(1)).as("n_at"),
          sum(when(col("died"), 1L).otherwise(0L)).as("d"))
        .withColumn("n_risk", sum(col("n_at")).over(
          Window.partitionBy(col("cohort")).orderBy(col("dur").asc)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .filter(col("d") > 0)
        .select(col("cohort"), col("dur"), col("n_risk"), col("d"))
        .collect() // date-domain bounded: ≤ span-days rows per cohort
        .groupBy(_.getString(0))
      val rows = steps.toSeq.flatMap { case (cohort, rs) =>
        var s6 = 1000000L
        rs.sortBy(_.getLong(1)).map { r =>
          val (dur, n, dd) = (r.getLong(1), r.getLong(2), r.getLong(3))
          s6 = (s6 * (n - dd)) / n
          (cohort, dur, n, dd, s6)
        }
      }
      import s.implicits._
      rows.toDF("cohort", "day", "n_at_risk", "n_died", "surv_x1e6")
    }
  )

  val oracle: Map[String, String] = Map(

    "q66_funnel" ->
      s"""WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1_us
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
          s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2_us
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click'
              AND epoch_us(e.ts) > s1.t1_us AND epoch_us(e.ts) <= s1.t1_us + $WinUs
            GROUP BY e.user_id),
          s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3_us
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase'
              AND epoch_us(e.ts) > s2.t2_us AND epoch_us(e.ts) <= s2.t2_us + $WinUs
            GROUP BY e.user_id)
          SELECT s1.user_id, s1.t1_us, s2.t2_us, s3.t3_us,
            CASE WHEN s3.t3_us IS NOT NULL THEN 1 ELSE 0 END AS converted
          FROM s1
          LEFT JOIN s2 ON s1.user_id = s2.user_id
          LEFT JOIN s3 ON s1.user_id = s3.user_id""",

    "q67_retention" ->
      """WITH firsts AS (SELECT user_id, min(epoch_us(ts)) AS first_us
           FROM events GROUP BY user_id)
         SELECT (f.first_us // 86400000000) AS cohort_day,
           (epoch_us(e.ts) // 86400000000) - (f.first_us // 86400000000) AS day_offset,
           count(DISTINCT e.user_id) AS n_users
         FROM events e JOIN firsts f ON e.user_id = f.user_id
         GROUP BY 1, 2""",

    "q68_json_props" ->
      """SELECT event_type,
           count(k) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k,
           max(k) AS max_k
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events)
         GROUP BY event_type""",

    "q163_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
          nb AS (SELECT count(DISTINCT ok)::BIGINT AS n FROM li),
          ms AS (SELECT greatest(n // 1000, 5) AS f FROM nb),
          items AS (SELECT p, count(*)::BIGINT AS n_i FROM li GROUP BY 1
                    HAVING count(*) >= (SELECT f FROM ms)),
          pairs AS (SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS n_ab
                    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
                    GROUP BY 1, 2 HAVING count(*) >= (SELECT f FROM ms)),
          j AS (SELECT pa, pb, ia.n_i AS n_a, ib.n_i AS n_b, n_ab
                FROM pairs JOIN items ia ON ia.p = pairs.pa
                           JOIN items ib ON ib.p = pairs.pb),
          rules AS (SELECT pa AS ante, pb AS cons, n_a, n_b, n_ab FROM j
                    UNION ALL
                    SELECT pb, pa, n_b, n_a, n_ab FROM j)
         SELECT ante, cons, n_a, n_b, n_ab,
                (1000 * n_ab // n_a)::BIGINT AS conf_x1000,
                ((1000000 * n_ab::HUGEINT * nb.n) // (n_a::HUGEINT * n_b))::BIGINT AS lift_x1e6
         FROM rules, nb
         WHERE 1000 * n_ab // n_a >= 100""",

    // the as-of pick as an explicit correlated rank — the structural
    // cross-check of the engine's window-over-union shape
    "q166_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
             epoch_ms(ts)::BIGINT AS t FROM events),
          buys AS (SELECT event_id AS buy_id, user_id, t AS buy_ms
                   FROM e WHERE event_type = 'purchase'),
          clicks AS (SELECT user_id, t AS click_ms, max(event_id) AS click_id
                     FROM e WHERE event_type = 'click' GROUP BY 1, 2),
          j AS (SELECT b.buy_id, b.user_id, b.buy_ms, c.click_ms, c.click_id,
                  row_number() OVER (PARTITION BY b.buy_id
                    ORDER BY c.click_ms DESC) AS rn
                FROM buys b LEFT JOIN clicks c
                  ON c.user_id = b.user_id AND c.click_ms <= b.buy_ms)
         SELECT buy_id, user_id, buy_ms,
                (CASE WHEN click_ms IS NOT NULL AND buy_ms - click_ms <= 604800000
                      THEN click_id ELSE -1 END)::BIGINT AS att_click_id,
                (CASE WHEN click_ms IS NOT NULL AND buy_ms - click_ms <= 604800000
                      THEN buy_ms - click_ms ELSE -1 END)::BIGINT AS gap_ms
         FROM j WHERE rn = 1""",

    "q188_sequence_mining" ->
      """WITH base AS (SELECT user_id, event_type, epoch_ms(ts)::BIGINT AS t,
             event_id FROM events),
          tri AS (SELECT event_type AS e1,
                    lead(event_type, 1) OVER w AS e2,
                    lead(event_type, 2) OVER w AS e3
                  FROM base
                  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
          cnts AS (SELECT e1, e2, e3, count(*)::BIGINT AS cnt FROM tri
                   WHERE e2 IS NOT NULL AND e3 IS NOT NULL GROUP BY 1, 2, 3),
          tot AS (SELECT sum(cnt)::BIGINT AS total FROM cnts)
         SELECT row_number() OVER (ORDER BY cnt DESC, e1, e2, e3)::BIGINT AS rank,
                e1, e2, e3, cnt,
                ((1000000 * cnt) // tot.total)::BIGINT AS support_x1e6
         FROM cnts, tot WHERE cnt >= 5
         ORDER BY cnt DESC, e1, e2, e3 LIMIT 20""",

    // the engine folds the survival recurrence on bounded driver rows;
    // the oracle walks the SAME recurrence as a linear recursive CTE
    "q189_kaplan_meier" ->
      """WITH RECURSIVE o AS (SELECT o_orderkey, o_orderpriority AS cohort,
             epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS od
           FROM orders),
          fs AS (SELECT l_orderkey AS o_orderkey,
                   min(epoch_ms(CAST(l_shipdate AS TIMESTAMP)) // 86400000)
                     AS sd
                 FROM lineitem GROUP BY 1),
          j AS (SELECT o.cohort, o.od, fs.sd
                FROM o JOIN fs USING (o_orderkey)),
          mx AS (SELECT max(od) AS c FROM j),
          lives AS (SELECT j.cohort, j.sd <= mx.c AS died,
                      CASE WHEN j.sd <= mx.c
                           THEN greatest(j.sd - j.od, 0)
                           ELSE greatest(mx.c - j.od, 0) END AS dur
                    FROM j, mx),
          st0 AS (SELECT cohort, dur, count(*)::BIGINT AS n_at,
                    sum(died::INT)::BIGINT AS d
                  FROM lives GROUP BY 1, 2),
          st AS (SELECT cohort, dur, d,
                   sum(n_at) OVER (PARTITION BY cohort ORDER BY dur
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT
                     AS n_risk
                 FROM st0),
          steps AS (SELECT cohort, dur, n_risk, d,
                      row_number() OVER (PARTITION BY cohort ORDER BY dur)::BIGINT
                        AS idx
                    FROM st WHERE d > 0),
          km(cohort, idx, surv) AS (
            SELECT cohort, 0::BIGINT, 1000000::BIGINT
            FROM (SELECT DISTINCT cohort FROM steps)
            UNION ALL
            SELECT s.cohort, s.idx,
                   ((k.surv * (s.n_risk - s.d)) // s.n_risk)::BIGINT
            FROM km k JOIN steps s ON s.cohort = k.cohort
              AND s.idx = k.idx + 1
          )
         SELECT s.cohort, s.dur AS day, s.n_risk AS n_at_risk,
                s.d AS n_died, k.surv::BIGINT AS surv_x1e6
         FROM steps s JOIN km k ON k.cohort = s.cohort AND k.idx = s.idx"""
  )
}
