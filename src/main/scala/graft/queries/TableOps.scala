package graft.queries

import graft.operators.ZOrder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-management operators: multi-dimensional Z-order clustering
  * (the `OPTIMIZE ZORDER BY` layout step) and ANALYZE-style column
  * profiling (the stats a cost-based optimizer feeds on). Both
  * integer-exact against DuckDB.
  */
object TableOps {

  private val ZBits = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-order value per order over (customer bucket, order-day bucket):
    // the Morton interleave that drives the layout in
    // ZOrder.repartitionByZ. The gate row checks the bit arithmetic
    // exactly (the SQL oracle is GENERATED from the same template as
    // the Column expression); the locality payoff — a box predicate
    // touching few range partitions — is asserted in ZOrderSpec, since
    // partition-touch counts are invisible to a SQL oracle. Narrow map.
    "q69_zorder" -> { (s, d) =>
      // o_orderdate is TIMESTAMP_NTZ in the parquet; with the session in
      // UTC the cast makes its wall-clock the instant, which is exactly
      // what DuckDB's epoch_us does with its (naive) TIMESTAMP
      val x = pmod(col("o_custkey"), lit(256L))
      val y = pmod(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"), lit(256L))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          x.as("xb"), y.as("yb"),
          ZOrder.zValue(x, y, ZBits).as("zval"))
    },

    // ANALYZE-style table profile of lineitem's numeric columns: row
    // count, nulls, exact NDV, and decimal-routed min/max per column,
    // one output row per column. Unpivot FIRST (stack to long
    // (col_name, value) rows), then two partial-aggregable shuffles:
    // (col_name, value) → distinct counts, then col_name → the stats
    // row. The alternative — one wide agg with k count(DISTINCT c_i) —
    // plans an Expand that copies every row k+1 times before the first
    // partial aggregate; the unpivot moves strictly fewer bytes (k
    // narrow rows, map-side-combined per distinct value) and stays in
    // whole-stage codegen. NDV groups the RAW double so the count is
    // exactly DuckDB's count(DISTINCT c); min/max route through
    // DECIMAL(18,2)·100 as everywhere else.
    "q70_profile" -> { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val stacked = cols.map(c => s"'$c', $c").mkString(", ")
      Tables.lineitem(s, d)
        .selectExpr(s"stack(${cols.length}, $stacked) AS (col_name, v)")
        .groupBy(col("col_name"), col("v"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("col_name"))
        .agg(sum(col("cnt")).as("n_rows"),
          sum(when(col("v").isNotNull, col("cnt")).otherwise(0L)).as("n_non_null"),
          count(col("v")).as("ndv"),
          min((col("v").cast("decimal(18,2)") * 100).cast("long")).as("min_x100"),
          max((col("v").cast("decimal(18,2)") * 100).cast("long")).as("max_x100"))
    },

    // Equi-WIDTH histogram (q63 is the equi-depth face): 20 fixed-width
    // buckets over cents, bucket id in pure integer arithmetic —
    // ((v-mn)*20) div (mx-mn+1) lands in [0,19] by construction with
    // no float boundary drift between engines. Global min/max is ONE
    // bounded row computed first (the second pass is the narrow bucket
    // map + a partial-aggregable count — two scans, the classic
    // histogram trade; a t-digest sketch is the one-pass approximate
    // escalation, q29).
    "q99_width_histogram" -> { (s, d) =>
      val cents = Tables.orders(s, d)
        .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val Array(mn, mx) = cents.agg(min(col("c")), max(col("c")))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
      cents.select(expr(s"((c - $mn) * 20) div ${mx - mn + 1}").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    },

    // Exact distributed covariance via integer moments: float
    // covar_pop is summation-order-dependent, so it can never cross a
    // hash gate (or reproduce across retries). The moments n, Σx, Σy,
    // Σxy are exact longs on the cents/hour domain; the covariance
    // NUMERATOR n·Σxy − Σx·Σy (denominator n²) is therefore exact —
    // callers divide at presentation time. One partial-aggregable
    // shuffle on the bounded event_type key.
    "q100_covariance" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("vx"),
          hour(col("ts")).cast("long").as("hh"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vx")).as("sx"),
          sum(col("hh")).as("sy"), sum(col("vx") * col("hh")).as("sxy"))
        .select(col("event_type"), col("n"), col("sx"), col("sy"), col("sxy"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"))
    },

    // Wide→long reshape through the Dataset unpivot operator itself
    // (q70's stack() is the expression face; this is the API face a
    // catalog/metrics pipeline calls). Narrow map, zero shuffles —
    // rows multiply by the value-column count but never move. Values
    // unify to double (unpivot requires one value type); no arithmetic
    // touches them, so the hash is engine-safe.
    "q95_unpivot" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")), "attr", "val")
    },

    // language, chosen by md5-of-id order — reproducible across runs,
    // reshards, and engines (no RNG state). The rank filter is its own
    // bare row_number window, which Spark 4 turns into a map-side
    // WindowGroupLimit: each input partition forwards at most 20 rows
    // per stratum to the shuffle, so the exchange carries ~|strata|·20
    // rows at ANY corpus size.
    "q71_eval_sample" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
    },

    // Referential-integrity audit: orphan counts for the two
    // fact→dimension edges, via LEFT ANTI joins on the uniform keys
    // (never a collect of the dimension). TPC-H-shaped data has no
    // organic orphans, so the child side is audited with planted
    // corruption — every key ≡ 0 (mod 97) is negated, which is absent
    // from any parent at any scale — keeping both the clean and the
    // violating path non-vacuous. Output: one row per relation.
    "q72_fk_audit" -> { (s, d) =>
      def corrupt(k: org.apache.spark.sql.Column) =
        when(pmod(k, lit(97)) === 0, -k - 1).otherwise(k)
      // one LAZY scan per edge: LEFT OUTER join on the (unique) parent
      // key, orphans = null parent after the join, rows counted in the
      // same aggregate — no eager driver-side jobs, and the join plan
      // is the returned frame's own (plan-asserted). Parent keys are
      // primary keys, so the left join cannot fan the child out.
      def edge(child: DataFrame, parent: DataFrame, rel: String): DataFrame =
        child.join(parent, col("ck") === col("pk"), "left")
          .agg(count(lit(1)).as("n_rows"),
            count(when(col("pk").isNull, 1)).as("n_orphans"))
          .select(lit(rel).as("relation"), col("n_rows"), col("n_orphans"))
      edge(
        Tables.lineitem(s, d).select(corrupt(col("l_orderkey")).as("ck")),
        Tables.orders(s, d).select(col("o_orderkey").as("pk")),
        "lineitem->orders")
        .unionAll(edge(
          Tables.orders(s, d).select(corrupt(col("o_custkey")).as("ck")),
          Tables.customer(s, d).select(col("c_custkey").as("pk")),
          "orders->customer"))
    },

    // Winsorization — outlier clipping at exact per-group percentiles
    // (the robust-stats data-prep step before training). percentile_disc
    // picks an ACTUAL data value (SQL-standard smallest-cume_dist≥p on
    // both engines), so the clamp bounds stay integer-exact. Two-pass
    // shape: the bounds aggregate is partial-aggregable and
    // |groups|-sized, then broadcasts back onto the row stream — the
    // big side never shuffles. Output: only the rows the clamp touched.
    "q79_winsorize" -> { (s, d) =>
      val t = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      // Spark's percentile_disc returns double; the value is an actual
      // long data point, so the cast back is exact
      val bounds = t.groupBy(col("o_orderstatus")).agg(
        expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)").cast("long").as("lo"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)").cast("long").as("hi"))
      t.join(broadcast(bounds), Seq("o_orderstatus"))
        .filter(col("cents") < col("lo") || col("cents") > col("hi"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("cents"),
          greatest(least(col("cents"), col("hi")), col("lo")).as("clipped"))
    },

    // Bounded per-group top-k via the native TopKLongs
    // TypedImperativeAggregate: top-3 order totals per customer. The
    // map-side partial carries AT MOST k longs per group — O(groups·k)
    // shuffle no matter how large the groups get, which neither
    // collect_list+slice (buffers whole groups) nor a window sort
    // (shuffles every row) can promise. Ties at the cut are
    // value-identical, so the multiset — and the sorted array — is
    // deterministic under any input order or merge-tree shape.
    // Output shape: the descending array is emitted as a ","-joined
    // STRING, not array<long> — the driver's gate sorts result rows
    // with pandas sort_values, which cannot hash ndarray cells; the
    // sorted-array determinism makes the joined string bytewise
    // stable, so nothing is lost crossing to the scalar domain.
    "q82_topk_agg" -> { (s, d) =>
      import org.apache.spark.sql.GraftSqlGlue
      import org.apache.spark.sql.catalyst.expressions.Literal
      val t = Tables.orders(s, d).select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val top3 = GraftSqlGlue.column(graft.functions.TopKLongs(
        GraftSqlGlue.expression(col("cents")), Literal(3)).toAggregateExpression())
      t.groupBy(col("o_custkey")).agg(top3.as("arr"))
        .select(col("o_custkey"),
          array_join(col("arr").cast("array<string>"), ",").as("top3"))
    },

    // Deterministic grouped concatenation (listagg): per order, the
    // sorted line summary string. collect_list is order-nondeterministic
    // under retries/AQE — array_sort before the join is what makes the
    // result stable and engine-portable (both engines compare the
    // composed strings bytewise). Partial-aggregable; state per group
    // is the group's own lines.
    "q81_group_concat" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          concat(col("l_linenumber").cast("string"), lit(":"),
            (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").cast("string")).as("line"))
        .groupBy(col("l_orderkey"))
        .agg(array_join(array_sort(collect_list(col("line"))), ",").as("lines"),
          count(lit(1)).as("n_lines"))
    },

    // MAD (median-absolute-deviation) outlier gate per source — the
    // ROBUST member of the dispersion family (q79 winsorize clamps by
    // percentile bounds; q152's moments give variance, which one
    // pathological document can blow up; MAD is breakdown-point-50%
    // robust). Rule: |x − median| > 2·MAD — the k = 2 robust fence,
    // carried as the exact rational 20000/10000 so both engines decide
    // identically (the normal-consistent 3σ analog k = 3·1.4826 never
    // fires on this corpus's light-tailed lengths, which would leave
    // the flag branch untested; k is the caller's knob either way).
    // Both medians use q130's
    // VALUE-DOMAIN shape: aggregate to (source, value, count) first —
    // one partial-aggregable shuffle — then the cumulative-frequency
    // window runs over rows bounded by distinct VALUES, never a
    // whole-source row sort; medians broadcast back. Degenerate
    // MAD = 0 (over half the group at the median) flags every
    // off-median row — the standard MAD caveat, same in both engines.
    "q160_mad_outliers" -> { (s, d) =>
      import graft.operators.ValueDomainStats
      val base = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
      val med = ValueDomainStats.medianOf(base, "source", "n_chars", "med")
      val dev = base.join(broadcast(med), "source")
        .withColumn("adev", abs(col("n_chars") - col("med")))
      val mad = ValueDomainStats.medianOf(
        dev.select(col("source"), col("adev")), "source", "adev", "mad")
      dev.join(broadcast(mad), "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), max(col("med")).as("med_chars"),
          max(col("mad")).as("mad_chars"),
          sum(when(col("adev") * 10000L > col("mad") * 20000L, 1L).otherwise(0L))
            .as("n_outliers"))
        .withColumn("outlier_pct_x100", expr("n_outliers * 10000 div n"))
        .select(col("source"), col("n"), col("med_chars"), col("mad_chars"),
          col("n_outliers"), col("outlier_pct_x100"))
    },

    // OLS linear fit per group in EXACT integer arithmetic — the
    // regression face of q100's covariance moments (value vs
    // hour-of-day per event_type): slope = (nΣxy − ΣxΣy)/(nΣx² − Σx²)
    // as the exact rational (num, den), plus presentation-scaled
    // slope·10⁶, intercept·10², and R²·10⁶ — every division an
    // integral divide over DECIMAL(38)/HUGEINT intermediates computed
    // in the SAME stepwise order in both engines (float covar_pop/
    // regr_slope can never cross a hash gate). One partial-aggregable
    // shuffle on the bounded group key; everything after runs on
    // |groups| rows.
    "q162_linfit" -> { (s, d) =>
      def dec(c: String): String = s"CAST($c AS DECIMAL(38,0))"
      Tables.events(s, d)
        .select(col("event_type"),
          hour(col("ts")).cast("long").as("x"),
          round(col("value") * 100).cast("long").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("num", expr(s"CAST(${dec("n")} * sxy - ${dec("sx")} * sy AS BIGINT)"))
        .withColumn("den", expr(s"CAST(${dec("n")} * sxx - ${dec("sx")} * sx AS BIGINT)"))
        .withColumn("vy", expr(s"${dec("n")} * syy - ${dec("sy")} * sy"))
        .withColumn("slope_x1e6", expr(
          s"CASE WHEN den = 0 THEN CAST(0 AS BIGINT) ELSE CAST((1000000 * ${dec("num")}) div den AS BIGINT) END"))
        .withColumn("icept_x100", expr(
          s"CASE WHEN den = 0 THEN CAST((100 * ${dec("sy")}) div n AS BIGINT) " +
            s"ELSE CAST((100 * (${dec("sy")} * den - ${dec("num")} * sx)) div (${dec("n")} * den) AS BIGINT) END"))
        .withColumn("r2_x1e6", expr(
          s"CASE WHEN den = 0 OR vy = 0 THEN CAST(0 AS BIGINT) " +
            s"ELSE CAST((((1000000 * ${dec("num")}) div den) * num) div vy AS BIGINT) END"))
        .select(col("event_type"), col("n"), col("num").as("slope_num"),
          col("den").as("slope_den"), col("slope_x1e6"), col("icept_x100"),
          col("r2_x1e6"))
    },

    // GINI COEFFICIENT + Lorenz deciles of customer spend — the
    // concentration report (how top-heavy is the revenue?) in exact
    // integer arithmetic: G·10⁶ = 10⁶·(2·Σ rᵢxᵢ − (n+1)·Σx)/(n·Σx)
    // over spend ranked ascending. The rank is the SCALE-CORRECT one:
    // GlobalRank's range-partitioned total order (one range shuffle +
    // reused-exchange offsets, q58's operator) — never a
    // single-partition ORDER BY. Decile id = 10·(r−1) div n (exact
    // equi-depth, q63's decomposition); the three Gini scalars ride
    // back as one bounded collect (BigInt driver arithmetic — Σrx
    // outgrows int64 at corpus scale). Output: 10 Lorenz rows, each
    // carrying the global Gini.
    "q165_gini" -> { (s, d) =>
      import graft.operators.GlobalRank
      val spend = Tables.orders(s, d)
        .select(col("o_custkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
        .groupBy(col("o_custkey")).agg(sum(col("c")).as("x"))
      val ranked = GlobalRank.rankWithTotal(spend,
        Seq(col("x").asc, col("o_custkey").asc), numParts = 32,
        rankCol = "r", totalCol = Some("n_tot"))
        .localCheckpoint() // reused: gini scalars + decile rollup
      val st = ranked.agg(
        sum(col("x")).as("sx"),
        sum(col("r").cast("decimal(38,0)") * col("x")).as("srx"),
        max(col("n_tot")).as("n")).collect()(0)
      val sx = BigInt(st.getLong(0))
      val srx = st.getDecimal(1).toBigInteger
      val n = BigInt(st.getLong(2))
      val gini = (BigInt(1000000) * (2 * BigInt(srx) - (n + 1) * sx)) / (n * sx)
      ranked
        .withColumn("decile", expr("(10 * (r - 1)) div n_tot"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("x")).as("decile_cents"))
        .withColumn("share_x1e6", expr(
          s"CAST((1000000 * CAST(decile_cents AS DECIMAL(38,0))) div ${sx.toLong} AS BIGINT)"))
        .withColumn("gini_x1e6", lit(gini.toLong))
        .select(col("decile"), col("n_cust"), col("decile_cents"),
          col("share_x1e6"), col("gini_x1e6"))
    }
  )

  val oracle: Map[String, String] = Map(

    "q95_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, p_size::DOUBLE AS val FROM part
         UNION ALL
         SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part""",

    "q99_width_histogram" ->
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
                    FROM orders),
            b AS (SELECT min(c) AS mn, max(c) AS mx FROM c)
         SELECT ((c.c - b.mn) * 20) // (b.mx - b.mn + 1) AS bucket, count(*) AS n
         FROM c, b GROUP BY 1""",

    "q100_covariance" ->
      """SELECT event_type, count(*) AS n,
           sum(round(value * 100)::BIGINT)::BIGINT AS sx,
           sum(hour(ts))::BIGINT AS sy,
           sum(round(value * 100)::BIGINT * hour(ts))::BIGINT AS sxy,
           (count(*) * sum(round(value * 100)::BIGINT * hour(ts))
             - sum(round(value * 100)::BIGINT) * sum(hour(ts)))::BIGINT AS cov_num
         FROM events GROUP BY 1""",

    "q69_zorder" -> {
      val z = ZOrder.zValueSql("xb", "yb", ZBits)
      s"""WITH t AS (
           SELECT o_orderkey,
             o_custkey % 256 AS xb,
             (epoch_us(o_orderdate) // 86400000000) % 256 AS yb
           FROM orders)
         SELECT o_orderkey, xb, yb, CAST($z AS BIGINT) AS zval FROM t"""
    },

    "q70_profile" -> {
      val per = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name,
             count(*) AS n_rows,
             count($c) AS n_non_null,
             count(DISTINCT $c) AS ndv,
             CAST(min(CAST($c AS DECIMAL(18,2)) * 100) AS BIGINT) AS min_x100,
             CAST(max(CAST($c AS DECIMAL(18,2)) * 100) AS BIGINT) AS max_x100
           FROM lineitem"""
      }
      per.mkString(" UNION ALL ")
    },

    "q71_eval_sample" ->
      """SELECT lang,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk,
           doc_id
         FROM documents
         QUALIFY rk <= 20""",

    "q72_fk_audit" ->
      """WITH li AS (
           SELECT CASE WHEN l_orderkey % 97 = 0 THEN -l_orderkey - 1 ELSE l_orderkey END AS ck
           FROM lineitem),
         ord AS (
           SELECT CASE WHEN o_custkey % 97 = 0 THEN -o_custkey - 1 ELSE o_custkey END AS ck
           FROM orders)
         SELECT 'lineitem->orders' AS relation,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM li WHERE ck NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
         UNION ALL
         SELECT 'orders->customer' AS relation,
           (SELECT count(*) FROM orders) AS n_rows,
           (SELECT count(*) FROM ord WHERE ck NOT IN (SELECT c_custkey FROM customer)) AS n_orphans""",

    "q79_winsorize" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM orders),
           b AS (SELECT o_orderstatus,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) AS lo,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS hi
             FROM t GROUP BY 1)
         SELECT t.o_orderkey, t.o_orderstatus, t.cents,
           greatest(least(t.cents, b.hi), b.lo) AS clipped
         FROM t JOIN b USING (o_orderstatus)
         WHERE t.cents < b.lo OR t.cents > b.hi""",

    "q82_topk_agg" ->
      """WITH t AS (SELECT o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM orders)
         SELECT o_custkey,
           array_to_string((list(cents ORDER BY cents DESC))[1:3], ',') AS top3
         FROM t GROUP BY 1""",

    "q81_group_concat" ->
      """WITH l AS (SELECT l_orderkey,
             l_linenumber::VARCHAR || ':' ||
               CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)::VARCHAR AS line
           FROM lineitem)
         SELECT l_orderkey, string_agg(line, ',' ORDER BY line) AS lines,
           count(*) AS n_lines
         FROM l GROUP BY 1""",

    "q160_mad_outliers" ->
      """WITH base AS (SELECT doc_id, source, n_chars FROM documents),
          m1 AS (SELECT source, n_chars, count(*)::BIGINT AS cnt
                 FROM base GROUP BY 1, 2),
          c1 AS (SELECT *, sum(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
                   sum(cnt) OVER (PARTITION BY source) AS nsrc
                 FROM m1),
          med AS (SELECT source, n_chars AS med FROM c1
                  WHERE cum >= (nsrc + 1) // 2 AND cum - cnt < (nsrc + 1) // 2),
          dev AS (SELECT b.source, abs(b.n_chars - med.med) AS adev, med.med
                  FROM base b JOIN med USING (source)),
          m2 AS (SELECT source, adev, count(*)::BIGINT AS cnt
                 FROM dev GROUP BY 1, 2),
          c2 AS (SELECT *, sum(cnt) OVER (PARTITION BY source ORDER BY adev) AS cum,
                   sum(cnt) OVER (PARTITION BY source) AS nsrc
                 FROM m2),
          mad AS (SELECT source, adev AS mad FROM c2
                  WHERE cum >= (nsrc + 1) // 2 AND cum - cnt < (nsrc + 1) // 2)
         SELECT d.source, count(*)::BIGINT AS n,
                max(d.med)::BIGINT AS med_chars, max(mad.mad)::BIGINT AS mad_chars,
                sum((d.adev * 10000 > mad.mad * 20000)::INT)::BIGINT AS n_outliers,
                (sum((d.adev * 10000 > mad.mad * 20000)::INT) * 10000
                   // count(*))::BIGINT AS outlier_pct_x100
         FROM dev d JOIN mad USING (source) GROUP BY 1""",

    "q162_linfit" ->
      """WITH m AS (SELECT event_type, count(*)::BIGINT AS n,
             sum(hour(ts)::BIGINT)::BIGINT AS sx,
             sum(round(value * 100)::BIGINT)::BIGINT AS sy,
             sum(hour(ts)::BIGINT * hour(ts)::BIGINT)::BIGINT AS sxx,
             sum(hour(ts)::BIGINT * round(value * 100)::BIGINT)::BIGINT AS sxy,
             sum(round(value * 100)::BIGINT * round(value * 100)::BIGINT)::BIGINT AS syy
           FROM events GROUP BY 1),
          dd AS (SELECT *,
                   (n::HUGEINT * sxy - sx::HUGEINT * sy)::BIGINT AS num,
                   (n::HUGEINT * sxx - sx::HUGEINT * sx)::BIGINT AS den,
                   n::HUGEINT * syy - sy::HUGEINT * sy AS vy
                 FROM m)
         SELECT event_type, n, num AS slope_num, den AS slope_den,
                (CASE WHEN den = 0 THEN 0
                      ELSE (1000000 * num::HUGEINT) // den END)::BIGINT AS slope_x1e6,
                (CASE WHEN den = 0 THEN (100 * sy::HUGEINT) // n
                      ELSE (100 * (sy::HUGEINT * den - num::HUGEINT * sx))
                           // (n::HUGEINT * den) END)::BIGINT AS icept_x100,
                (CASE WHEN den = 0 OR vy = 0 THEN 0
                      ELSE (((1000000 * num::HUGEINT) // den) * num) // vy END)::BIGINT AS r2_x1e6
         FROM dd""",

    "q165_gini" ->
      """WITH spend AS (SELECT o_custkey,
             sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS x
           FROM orders GROUP BY 1),
          r AS (SELECT o_custkey, x,
                  row_number() OVER (ORDER BY x, o_custkey) AS r,
                  count(*) OVER () AS n, sum(x) OVER () AS sx
                FROM spend),
          g AS (SELECT ((1000000 * (2 * sum(r::HUGEINT * x)
                          - (max(n) + 1)::HUGEINT * max(sx)))
                        // (max(n)::HUGEINT * max(sx)))::BIGINT AS gini
                FROM r)
         SELECT (10 * (r - 1)) // n AS decile, count(*)::BIGINT AS n_cust,
                sum(x)::BIGINT AS decile_cents,
                (1000000 * sum(x) // max(sx))::BIGINT AS share_x1e6,
                g.gini AS gini_x1e6
         FROM r, g GROUP BY 1, g.gini"""
  )
}
