package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator surface over the driver tables: scan, filter
  * (pushdown), aggregate, joins (broadcast / shuffle / semi / anti),
  * window, distinct, top-k, set ops, rollup.
  *
  * These queries double as the scale contract: every join keeps the
  * small side broadcastable, every aggregate is partial-aggregable
  * (map-side combine), and predicates/projections are plain Columns so
  * Catalyst pushes them into the parquet scan.
  *
  * Numeric discipline for the DuckDB oracle hash-compare: double
  * aggregates go through DECIMAL(18,2) (exact, associative — immune to
  * float summation order across engines) and are cast back to double at
  * the end. Raw double columns are hash-safe (no arithmetic).
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S3/S5: full scan + partial aggregation (TPC-H Q1 shape).
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },
    // F1/F2-analogue: range predicates pushed to the parquet scan.
    "q02_filter_pushdown" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
                $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
    },
    // S2-analogue: equi-join where AQE/autoBroadcastJoinThreshold picks
    // the strategy. No forced broadcast hint: customer grows with SF, so
    // a pinned hint would OOM at 100 TB; genuinely bounded dims
    // (nation/region) keep explicit hints elsewhere.
    "q03_join_broadcast" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(sum(dec($"o_totalprice")).cast("double").as("revenue"),
             count(lit(1)).as("n_orders"))
    },
    // Large-side shuffle join + aggregate.
    "q04_join_shuffle" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount"))).cast("double").as("revenue"),
             count(lit(1)).as("n_items"))
    },
    // Multi-way join (TPC-H Q5 shape): dims broadcast, facts shuffle.
    "q05_multi_join" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(Tables.supplier(s, d),
              $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount"))).cast("double").as("revenue"))
    },
    // F5: existence anti-join (customers with no big-ticket orders —
    // filtered right side so rows actually survive at every SF).
    "q06_anti_join" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter($"o_totalprice" > 300000.0),
              $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_nationkey")
    },
    // Semi-join (EXISTS).
    "q07_semi_join" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter($"o_totalprice" > 100000.0),
              $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_acctbal")
    },
    // Window functions: rank + running sum per supplier.
    "q08_window" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      // rank filter FIRST, in its own Window: with row_number alone,
      // InferWindowGroupLimit plants a map-side top-3-per-key
      // (WindowGroupLimit Partial) BEFORE the shuffle, so the exchange
      // moves ~3·|keys| rows instead of the whole table — the shape that
      // matters at 100 TB. The running sum then runs over the survivors
      // in a second Window (same partitioning+order → no extra
      // exchange): a frame of unboundedPreceding..currentRow at rows
      // 1..3 only ever reads rows 1..3, so values are identical to the
      // fused formulation (which defeats the group-limit rewrite).
      // (l_orderkey, l_linenumber) is a unique key, so the order — and
      // therefore the prefix sums — is total and deterministic.
      Tables.lineitem(s, d)
        .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
          dec($"l_quantity").as("__qty"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .withColumn("running_qty",
          sum($"__qty").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .select($"l_suppkey", $"rn", $"l_orderkey", $"l_linenumber", $"running_qty")
    },
    // Distinct (shuffle dedup on low-cardinality keys).
    "q09_distinct" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d).select($"l_returnflag", $"l_linestatus").distinct()
    },
    // Top-k with total (tie-broken) order.
    "q10_topk" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .select($"o_orderkey", $"o_totalprice")
        .limit(100)
    },
    // Set ops: UNION / INTERSECT / EXCEPT on nation keys.
    "q11_set_ops" -> { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".cast("int").as("nk"))
      val p = Tables.supplier(s, d).select($"s_nationkey".cast("int").as("nk"))
      val u = c.union(p).distinct().withColumn("src", lit("union"))
      val i = c.intersect(p).withColumn("src", lit("intersect"))
      val e = c.except(p).withColumn("src", lit("except"))
      u.union(i).union(e)
    },
    // Event-time bucketed aggregation (batch analogue of the streaming
    // windowed agg; event_time semantics like F2).
    "q12_events_hourly" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(date_format($"ts", "yyyy-MM-dd HH").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
             sum(dec($"value")).cast("double").as("total_value"),
             countDistinct($"user_id").as("n_users"))
    },
    // Rollup (grouping sets).
    "q13_rollup" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum(dec($"l_quantity")).cast("double").as("qty"))
    },
    // The rest of the window-function family (q08 covers row_number +
    // running frames): lag/lead, ntile, percent_rank, cume_dist — one
    // Window partitioning, ONE exchange for all six functions (they
    // share partitionBy+orderBy, so Catalyst fuses them into a single
    // Window node). The order key (o_orderdate, o_orderkey) is total,
    // so rank-based doubles are exact rationals k/(n-1) — one IEEE
    // division, identical in both engines. lag/lead carry raw doubles
    // (no arithmetic → hash-safe).
    "q88_window_suite" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .withColumn("next_price", lead($"o_totalprice", 1).over(w))
        .select($"o_custkey", $"o_orderkey", $"rn", $"quartile", $"pr", $"cd",
          $"prev_price", $"next_price")
    },
    // Full outer join — the reconciliation shape (rows surviving from
    // either side with nulls opposite). A full outer can never
    // broadcast and never prunes partitions: both sides shuffle on the
    // key, so at scale the defense is the same as any fact⋈fact join —
    // AQE skew-split plus bucketing (q49) when it recurs.
    "q89_full_outer" -> { (s, d) =>
      import s.implicits._
      val bought = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp"))
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec($"o_totalprice")).cast("double").as("revenue"))
      val rich = Tables.customer(s, d)
        .filter($"c_acctbal" > 5000.0)
        .select($"c_custkey", $"c_name", $"c_acctbal")
      bought.join(rich, $"o_custkey" === $"c_custkey", "full_outer")
        .select(coalesce($"o_custkey", $"c_custkey").as("custkey"),
          $"n_orders", $"revenue", $"c_name", $"c_acctbal")
    },
    // NULL-safe equality join (<=>): NULL keys match each other instead
    // of vanishing — the semantics a dirty-dimension reconciliation
    // needs. Planted NULLs on both sides (the TPC-H keys have none);
    // <=> is a legal equi-join key, so this stays a hash join — the
    // NULL group is ONE key, i.e. the textbook skew key at scale: if
    // the NULL fraction is material, route it through the q75 hot/cold
    // split instead of letting one task take the whole NULL⋈NULL block.
    "q97_nullsafe_join" -> { (s, d) =>
      import s.implicits._
      val a = Tables.customer(s, d).select(
        when($"c_custkey" % 20 === 0, lit(null)).otherwise($"c_nationkey")
          .cast("int").as("ka"))
      val b = Tables.supplier(s, d).select(
        when($"s_suppkey" % 7 === 0, lit(null)).otherwise($"s_nationkey")
          .cast("int").as("kb"))
      a.join(b, $"ka" <=> $"kb")
        .groupBy($"ka").agg(count(lit(1)).as("n_pairs"))
        .select($"ka".as("k"), $"n_pairs")
    },

    // SKYLINE (Pareto frontier) of orders over (earlier date, higher
    // price): an order is on the frontier iff no other order strictly
    // precedes it in date AND strictly exceeds it in price — the
    // classic dominance operator, in its scale-correct 2D shape.
    // Naive skyline is an O(n²) dominance self-join; the decomposition
    // here is exact and linear: dominance only depends on the MAX price
    // per date, so one partial-aggregable date rollup produces a
    // VALUE-DOMAIN-bounded (|dates|) table, a prefix-max window over
    // that bounded table yields the strictly-earlier threshold per
    // date (the q103 bounded-window class, not a data sort), and the
    // thresholds broadcast back onto the fact scan as one narrow
    // filter. Price rides DECIMAL(18,2)→cents (the q73 exactness
    // discipline). The oracle takes the structurally opposite route —
    // NOT EXISTS dominance against the date-max table — so the hash
    // gate cross-checks decomposition against definition.
    "q157_skyline" -> { (s, d) =>
      val c = Tables.orders(s, d).select(
        col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("date_ms"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      val dmax = c.groupBy(col("date_ms")).agg(max(col("cents")).as("mc"))
      val w = Window.orderBy(col("date_ms").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val thr = dmax
        .withColumn("thr", max(col("mc")).over(w)) // |dates| rows — bounded
        .select(col("date_ms"), col("thr"))
      c.join(broadcast(thr), Seq("date_ms"))
        .filter(col("thr").isNull || col("cents") >= col("thr"))
        .select(col("o_orderkey"), col("date_ms"), col("cents"))
    },

    // GROUPING SETS — the explicit face completing the multi-level
    // aggregation trio (q13 ROLLUP, q36 CUBE): four chosen grouping
    // levels in ONE pass, with grouping() flags disambiguating "NULL
    // because aggregated" from data nulls. Physical shape is the same
    // Expand + partial-aggregable hash aggregate as rollup/cube — the
    // row replication factor is the (constant) number of grouping
    // sets, map-side combined before the one exchange.
    "q164_grouping_sets" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
          round(col("value") * 100).cast("long").as("vx"))
        .createOrReplaceTempView("q164_base")
      val out = s.sql(
        """SELECT event_type, day,
             CAST(grouping(event_type) AS BIGINT) AS g_type,
             CAST(grouping(day) AS BIGINT) AS g_day,
             count(*) AS n, sum(vx) AS sum_vx
           FROM q164_base
           GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())""")
      s.catalog.dropTempView("q164_base") // plan already bound
      out
    }
  )

  /** DuckDB-dialect oracle SQL, column-name and value aligned. */
  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "q03_join_broadcast" ->
      """SELECT c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q04_join_shuffle" ->
      """SELECT o_orderpriority,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""",
    "q05_multi_join" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name""",
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""",
    "q07_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)""",
    "q08_window" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_qty FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
           FROM lineitem) WHERE rn <= 3""",
    "q09_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q10_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q11_set_ops" ->
      """SELECT nk, 'union' AS src FROM (SELECT CAST(c_nationkey AS INT) AS nk FROM customer UNION SELECT CAST(s_nationkey AS INT) FROM supplier)
         UNION ALL
         SELECT nk, 'intersect' AS src FROM (SELECT CAST(c_nationkey AS INT) AS nk FROM customer INTERSECT SELECT CAST(s_nationkey AS INT) FROM supplier)
         UNION ALL
         SELECT nk, 'except' AS src FROM (SELECT CAST(c_nationkey AS INT) AS nk FROM customer EXCEPT SELECT CAST(s_nationkey AS INT) FROM supplier)""",
    "q12_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         COUNT(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1, 2""",
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q88_window_suite" ->
      """SELECT o_custkey, o_orderkey,
           ROW_NUMBER()   OVER w AS rn,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST()    OVER w AS cd,
           LAG(o_totalprice, 1)  OVER w AS prev_price,
           LEAD(o_totalprice, 1) OVER w AS next_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "q89_full_outer" ->
      """SELECT COALESCE(b.o_custkey, r.c_custkey) AS custkey,
           b.n_orders, b.revenue, r.c_name, r.c_acctbal
         FROM (SELECT o_custkey, COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
               FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
               GROUP BY o_custkey) b
         FULL OUTER JOIN (SELECT c_custkey, c_name, c_acctbal FROM customer
                          WHERE c_acctbal > 5000.0) r
           ON b.o_custkey = r.c_custkey""",
    "q97_nullsafe_join" ->
      """SELECT a.ka AS k, count(*) AS n_pairs
         FROM (SELECT CASE WHEN c_custkey % 20 = 0 THEN NULL
                           ELSE c_nationkey END::INT AS ka FROM customer) a
         JOIN (SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL
                           ELSE s_nationkey END::INT AS kb FROM supplier) b
           ON a.ka IS NOT DISTINCT FROM b.kb
         GROUP BY 1""",

    // dominance by definition (NOT EXISTS against the date-max table)
    // — the structural cross-check of the engine's prefix-max
    // decomposition
    "q157_skyline" ->
      """WITH c AS (SELECT o_orderkey, o_orderdate,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM orders),
          dm AS (SELECT o_orderdate AS d, max(cents) AS mc FROM c GROUP BY 1)
         SELECT o_orderkey, epoch_ms(o_orderdate)::BIGINT AS date_ms, cents
         FROM c
         WHERE NOT EXISTS (SELECT 1 FROM dm
                           WHERE dm.d < c.o_orderdate AND dm.mc > c.cents)""",

    "q164_grouping_sets" ->
      """WITH b AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             round(value * 100)::BIGINT AS vx
           FROM events)
         SELECT event_type, day,
                grouping(event_type)::BIGINT AS g_type,
                grouping(day)::BIGINT AS g_day,
                count(*)::BIGINT AS n, sum(vx)::BIGINT AS sum_vx
         FROM b
         GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())"""
  )
}
