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
         GROUP BY event_type"""
  )
}
