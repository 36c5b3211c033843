package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral affinity + robust-trend operators over the events table
  * (round 10): item-item cosine similarity (the collaborative-filtering
  * primitive), a Markov transition chain with its stationary
  * distribution, the Theil–Sen robust trend estimator, session PMI
  * co-occurrence, and a CEP-style negative-pattern detector
  * ("A never followed by B within the window").
  *
  * Determinism discipline (the q171/q162 rules): every real-valued
  * statistic ships as exact integer pieces plus a presentation-scaled
  * truncating quotient (Spark `div` ≡ DuckDB `//`, both toward zero);
  * no square roots, no floating aggregation anywhere.
  */
object Affinity {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Item-item similarity over the user×type interaction matrix —
    // "users who do A also do B", the collaborative-filtering
    // primitive. Vector per event type = per-user interaction counts;
    // similarity = cosine. Exact pieces: dot = Σ_u c_ua·c_ub (BIGINT,
    // order-free), norms² = Σ_u c², and the q162 r²-discipline for the
    // irrational cosine: signed cos²·10¹² = dot²·10¹²/(n2a·n2b) in
    // DECIMAL(38) truncating division. Shapes for 100 TB: the
    // interaction matrix is ONE partial-aggregable (user, type)
    // count; the pair stage joins the matrix to itself ON user_id —
    // an equi-join whose per-user fan-out is |types|² (bounded), never
    // a cartesian; norms ride a broadcast. At planet scale this is
    // exactly the DIMSUM/item-CF shape: shuffle keyed on the user,
    // output keyed on the bounded type-pair set.
    "q196_item_similarity" -> { (s, d) =>
      val uc = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val norms = uc.groupBy(col("event_type"))
        .agg(sum(col("c") * col("c")).as("n2"))
      uc.as("a").join(uc.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(sum(col("a.c") * col("b.c")).as("dot"))
        .join(broadcast(norms.select(col("event_type").as("type_a"), col("n2").as("n2a"))), "type_a")
        .join(broadcast(norms.select(col("event_type").as("type_b"), col("n2").as("n2b"))), "type_b")
        .select(col("type_a"), col("type_b"), col("dot"),
          expr("CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000000000) div " +
            "(CAST(n2a AS DECIMAL(38,0)) * n2b) AS BIGINT)").as("cos2_x1e12"))
    },

    // First-order Markov chain over each user's event sequence:
    // transition counts from consecutive events (per-user lag window,
    // (ts, event_id) tie-break), then the stationary distribution by
    // 20 power-iteration steps on the |types|² transition matrix. The
    // corpus-sized work is ONE per-user window pass + one bounded
    // (from, to) count; the iteration folds driver-side over ≤ 25
    // rows in pure fixed-point integer arithmetic (state scaled by
    // 10¹²,each term (x·c) div rowsum — truncation identical to the
    // oracle's HUGEINT `//` chain), so the result is bit-stable with
    // no floating point anywhere. The 100 TB shape: window + count
    // shuffle on user_id; matrix size grows with |types|, not data.
    "q197_markov_stationary" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("c"))
        .collect() // bounded: |types|² rows
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val types = trans.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val rowSum = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val Scale = 1000000000000L
      var x: Map[String, Long] = types.map(_ -> Scale / types.length).toMap
      for (_ <- 1 to 20) {
        val nx = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        trans.foreach { case (from, to, c) =>
          // per-term product in BigInt: x is scaled by 1e12, so a Long
          // product overflows silently once a transition count passes
          // ~9.2M — the oracle runs the same chain in HUGEINT, and the
          // truncation chains must stay identical at any scale. The
          // loop is driver-side over ≤ |types|² rows; cost negligible.
          nx(to) += (BigInt(x(from)) * c / rowSum(from)).toLong
        }
        x = types.map(t => t -> nx(t)).toMap
      }
      val out = types.map(t => (t, x(t), rowSum.getOrElse(t, 0L))).toSeq
      s.createDataFrame(out).toDF("event_type", "stat_x1e12", "out_transitions")
    },

    // Theil–Sen robust trend of daily event volume per type: the
    // median over all pairwise slopes — the estimator that shrugs off
    // outlier days where least squares (q162) bends. Slopes are exact
    // scaled rationals ((c2-c1)·10⁶ div Δdays, truncating); the pair
    // grid lives on the DAILY table (calendar² per type, bounded at
    // any corpus size — the q186 dense-grid posture), and the median
    // interpolates two integers (exact .0/.5, the q35 discipline).
    // Corpus-sized work: one partial-aggregable (type, day) count.
    "q198_theil_sen" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
        .select(col("a.event_type").as("event_type"),
          ((col("b.c") - col("a.c")) * lit(1000000L)).as("dc"),
          datediff(col("b.day"), col("a.day")).cast("long").as("dd"))
        .select(col("event_type"), expr("dc div dd").as("slope_x1e6"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("percentile(slope_x1e6, 0.5)").as("sen_slope_x1e6"))
    },

    // Session co-occurrence lift: which event types happen together in
    // the same (user, hour) bucket beyond what their marginals predict
    // — PMI's exact-integer core (lift = the ratio inside PMI's log;
    // the log itself is banned from hashed output by the q34 rule:
    // ln() need not match across C and Java runtimes, a monotone
    // integer score hash-matches exactly). Bucket-presence counts use
    // distinct-bucket semantics, so a burst of clicks in one hour
    // counts once. Shapes: one distinct over (user, hour, type) —
    // partial-aggregable — then a self equi-join on the bucket key
    // with bounded |types|² fan-out.
    "q199_session_lift" -> { (s, d) =>
      val b = Tables.events(s, d)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .distinct()
      val nType = b.groupBy(col("event_type")).agg(count(lit(1)).as("nt"))
      val nBuckets = b.select(col("user_id"), col("hr")).distinct().count()
      b.as("a").join(b.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.hr") === col("b.hr") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
        .join(broadcast(nType.select(col("event_type").as("type_a"), col("nt").as("n_a"))), "type_a")
        .join(broadcast(nType.select(col("event_type").as("type_b"), col("nt").as("n_b"))), "type_b")
        .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"), col("n_b"),
          expr(s"CAST((CAST(n_ab AS DECIMAL(38,0)) * ${nBuckets}L * 1000000) div " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_x1e6"))
    },

    // CEP negative pattern — "viewed but never purchased within the
    // hour": per user, each view event with NO purchase in
    // (t, t+1h]. The match-recognize shape SQL can't window: a
    // followed-by-absence. Implemented as a per-user interval
    // anti-join (equi on user + time-range predicate), then one
    // user-level rollup. Scale: both sides shuffle once on user_id;
    // per-user event lists are session-sized, so the range probe is
    // local and linear — never a time cross-join.
    "q200_cep_abandoned" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
      val views = ev.filter(col("event_type") === "view")
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("buy_us"))
      val WinUs = 3600000000L // 1 hour
      views.join(buys,
          views("user_id") === buys("user_id") &&
            col("buy_us") > col("us") && col("buy_us") <= col("us") + WinUs,
          "left_anti")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_abandoned"), min(col("us")).as("first_abandoned_us"))
    },

    // Behavioral DIVERSITY per user — the Gini–Simpson index
    // 1 − Σp², the entropy-family measure with an exact rational
    // core (Shannon entropy's ln is banned from hashed output by the
    // q34 rule; Gini–Simpson is the standard integer-exact stand-in):
    // diversity·10⁶ = 10⁶·(n² − Σc²) div n². One partial-aggregable
    // (user, type) count, one user rollup — both shuffles on user_id,
    // the second reusing the first's key. Flags one-note users
    // (diversity 0) the engagement models down-weight.
    "q206_behavior_diversity" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).as("sum_c2"))
        .withColumn("diversity_x1e6",
          expr("(1000000 * (n_events * n_events - sum_c2)) div (n_events * n_events)"))
        .select(col("user_id"), col("n_events"), col("n_types"), col("diversity_x1e6"))
    }
  )

  /** q197's oracle: the identical fixed-point chain, unrolled — 20
    * generated CTE steps of `sum((x·c) // rowsum)` in HUGEINT, so the
    * truncation points line up with the driver fold exactly. */
  private val markovSql: String = {
    val steps = (1 to 20).map { k =>
      s"""x$k AS (SELECT t.to_type AS ty,
                 sum(x.v * t.c // t.rs)::BIGINT AS v
               FROM x${k - 1} x JOIN tr t ON t.from_type = x.ty GROUP BY 1)"""
    }.mkString(",\n          ")
    s"""WITH seq AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
              lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                AS next_type
            FROM events),
          trc AS (SELECT event_type AS from_type, next_type AS to_type,
                count(*)::BIGINT AS c
              FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
          tr AS (SELECT from_type, to_type, c::HUGEINT AS c,
                (sum(c) OVER (PARTITION BY from_type))::HUGEINT AS rs FROM trc),
          types AS (SELECT DISTINCT from_type AS ty FROM trc
                    UNION SELECT DISTINCT to_type FROM trc),
          x0 AS (SELECT ty, (1000000000000::HUGEINT
                   // (SELECT count(*) FROM types))::BIGINT AS v FROM types),
          $steps
         SELECT t.ty AS event_type, coalesce(x.v, 0)::BIGINT AS stat_x1e12,
                coalesce((SELECT sum(c)::BIGINT FROM trc WHERE from_type = t.ty), 0)::BIGINT
                  AS out_transitions
         FROM types t LEFT JOIN x20 x ON x.ty = t.ty"""
  }

  val oracle: Map[String, String] = Map(
    "q196_item_similarity" ->
      """WITH uc AS (SELECT user_id, event_type, count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
          n AS (SELECT event_type, sum(c * c)::BIGINT AS n2 FROM uc GROUP BY 1),
          p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                sum(a.c * b.c)::BIGINT AS dot
              FROM uc a JOIN uc b ON a.user_id = b.user_id
                AND a.event_type < b.event_type
              GROUP BY 1, 2)
         SELECT p.type_a, p.type_b, p.dot,
                ((p.dot::HUGEINT * p.dot * 1000000000000)
                 // (na.n2::HUGEINT * nb.n2))::BIGINT AS cos2_x1e12
         FROM p JOIN n na ON na.event_type = p.type_a
                JOIN n nb ON nb.event_type = p.type_b""",

    "q197_markov_stationary" -> markovSql,

    "q198_theil_sen" ->
      """WITH daily AS (SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
          slopes AS (SELECT a.event_type,
                ((b.c - a.c) * 1000000 // date_diff('day', a.day, b.day))::BIGINT
                  AS slope_x1e6
              FROM daily a JOIN daily b ON a.event_type = b.event_type
                AND a.day < b.day)
         SELECT event_type, count(*)::BIGINT AS n_pairs,
                quantile_cont(slope_x1e6, 0.5) AS sen_slope_x1e6
         FROM slopes GROUP BY 1""",

    "q199_session_lift" ->
      """WITH b AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr, event_type
           FROM events),
          nt AS (SELECT event_type, count(*)::BIGINT AS n FROM b GROUP BY 1),
          nb AS (SELECT count(*)::BIGINT AS n
                 FROM (SELECT DISTINCT user_id, hr FROM b)),
          p AS (SELECT a.event_type AS type_a, b2.event_type AS type_b,
                count(*)::BIGINT AS n_ab
              FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.hr = b2.hr
                AND a.event_type < b2.event_type
              GROUP BY 1, 2)
         SELECT p.type_a, p.type_b, p.n_ab, na.n AS n_a, nb2.n AS n_b,
                ((p.n_ab::HUGEINT * (SELECT n FROM nb) * 1000000)
                 // (na.n::HUGEINT * nb2.n))::BIGINT AS lift_x1e6
         FROM p JOIN nt na ON na.event_type = p.type_a
                JOIN nt nb2 ON nb2.event_type = p.type_b""",

    "q200_cep_abandoned" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
           FROM events)
         SELECT v.user_id, count(*)::BIGINT AS n_abandoned,
                min(v.us)::BIGINT AS first_abandoned_us
         FROM ev v
         WHERE v.event_type = 'view' AND NOT EXISTS (
           SELECT 1 FROM ev p
           WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
             AND p.us > v.us AND p.us <= v.us + 3600000000)
         GROUP BY v.user_id""",

    "q206_behavior_diversity" ->
      """WITH uc AS (SELECT user_id, event_type, count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
          u AS (SELECT user_id, sum(c)::BIGINT AS n_events,
                  count(*)::BIGINT AS n_types, sum(c * c)::BIGINT AS sum_c2
                FROM uc GROUP BY 1)
         SELECT user_id, n_events, n_types,
                ((1000000 * (n_events * n_events - sum_c2))
                 // (n_events * n_events))::BIGINT AS diversity_x1e6
         FROM u"""
  )
}
