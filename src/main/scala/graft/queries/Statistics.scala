package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inferential statistics over the corpus/event tables: Spearman rank
  * correlation, two-sample Kolmogorov–Smirnov distribution comparison,
  * and the chi-square test of independence. These are the hypothesis-
  * testing face of the descriptive-statistics family (q100 covariance,
  * q152 moments, q162 OLS, q160 MAD): the numbers a data curator reads
  * before trusting a source mix. Engine-portability discipline as
  * everywhere — every statistic is an exact integer/rational (ranks
  * doubled to absorb tie-midpoints, ECDF distances cleared of their
  * denominators, chi-square cleared to ×10⁶), so each row hash-matches
  * DuckDB bit-for-bit with zero floats.
  */
object Statistics {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SPEARMAN RANK CORRELATION per source between document length
    // (n_chars) and token count — the monotone-association check that
    // is robust where q100's Pearson is not. Ties take the textbook
    // midpoint rank, kept exact by DOUBLING: for a tie group of size g
    // starting after c smaller rows, 2·avg_rank = 2c + g + 1 (always
    // integral). ρ is then Pearson over doubled ranks, reported as the
    // exact rational pieces (num, dxx, dyy) plus the signed, squared,
    // presentation-scaled sρ²·10¹² = sign(num)·num²·10¹²/(dxx·dyy) —
    // the q162 r²-discipline (a square root is irrational; its square
    // is not). Range bound (the q152 discipline): ranks ≤ 2n keep
    // num < 4n³, inside int64 for n ≤ ~1.3M rows per source — beyond
    // that the exact pieces ship as DECIMAL(38) strings like q152's
    // s3/s4 (the ×10¹² presentation scalar is computed in DECIMAL(38)
    // already). Shapes for 100 TB: the rank map lives on the DISTINCT
    // (source, value) table — value-domain bounded, never data-sized —
    // so the only data-sized work is one partial-aggregable groupBy to
    // build it and one broadcast-join pass to accumulate the six
    // Spearman sums per source. No window ever touches a data-sized
    // partition.
    "q171_spearman" -> { (s, d) =>
      val base = Tables.documents(s, d).select(col("source"),
        col("n_chars").as("x"),
        expr("CAST(size(filter(split(text, ' '), t -> length(t) > 0)) AS BIGINT)").as("y"))
      def rank2(vc: String, out: String): DataFrame = {
        val w = Window.partitionBy(col("source")).orderBy(col(vc).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base.groupBy(col("source"), col(vc)).agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(w))
          .select(col("source"), col(vc),
            (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L)).as(out))
      }
      def dec(c: String): String = s"CAST($c AS DECIMAL(38,0))"
      base.join(broadcast(rank2("x", "rx2")), Seq("source", "x"))
        .join(broadcast(rank2("y", "ry2")), Seq("source", "y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
          sum(col("rx2") * col("rx2")).as("sxx"),
          sum(col("ry2") * col("ry2")).as("syy"),
          sum(col("rx2") * col("ry2")).as("sxy"))
        .withColumn("num", expr(s"CAST(${dec("n")} * sxy - ${dec("sx")} * sy AS BIGINT)"))
        .withColumn("dxx", expr(s"CAST(${dec("n")} * sxx - ${dec("sx")} * sx AS BIGINT)"))
        .withColumn("dyy", expr(s"CAST(${dec("n")} * syy - ${dec("sy")} * sy AS BIGINT)"))
        .withColumn("rho2s_x1e12", expr(
          "CASE WHEN dxx = 0 OR dyy = 0 THEN CAST(0 AS BIGINT) ELSE " +
            s"CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END * " +
            s"((${dec("num")} * num * 1000000000000) div (${dec("dxx")} * dyy)) AS BIGINT) END"))
        .select(col("source"), col("n"), col("num").as("rho_num"),
          col("dxx"), col("dyy"), col("rho2s_x1e12"))
    },

    // TWO-SAMPLE KOLMOGOROV–SMIRNOV against the reference source: for
    // each source s ≠ src0, D = max_v |F_s(v) − F_0(v)| over the
    // n_chars distribution — the drift detector that sees SHAPE changes
    // q125's token chi-square cannot (same vocabulary, shifted length
    // mix). Exact rational: at each value, |n₀·C_s(v) − n_s·C_0(v)| is
    // an integer and D's denominator is n_s·n₀; the report carries the
    // cleared numerator, D·10⁶ by integral divide, and the EARLIEST
    // value attaining the max (deterministic tie-break). Shapes: the
    // data-sized pass is one partial-aggregable (source, value) count;
    // ECDFs live on the dense (distinct values × sources) grid — both
    // factors value-domain/vocabulary bounded, so the windows and the
    // reference join run on a bounded table at any corpus scale. (A
    // continuous measure would bucket first — q63's equi-depth is the
    // front door.)
    "q172_ks_test" -> { (s, d) =>
      val cnt = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      val vals = cnt.select(col("v")).distinct()
      val srcs = cnt.groupBy(col("source")).agg(sum(col("c")).as("ns"))
      val dense = srcs.crossJoin(broadcast(vals))
        .join(cnt, Seq("source", "v"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val ecdf = graft.operators.ValueDomainStats.cumFreq(dense, "source", "v", "c")
        .select(col("source"), col("ns"), col("v"), col("cum"))
      val ref = ecdf.filter(col("source") === "src0")
        .select(col("v"), col("ns").as("n_ref"), col("cum").as("cum_ref"))
      val dist = ecdf.filter(col("source") =!= "src0")
        .join(broadcast(ref), Seq("v"))
        .withColumn("dn", abs(col("n_ref") * col("cum") - col("ns") * col("cum_ref")))
        .select(col("source"), col("ns"), col("n_ref"), col("v"), col("dn"))
      val mx = dist.groupBy(col("source"))
        .agg(max(col("ns")).as("n"), max(col("n_ref")).as("nr"),
          max(col("dn")).as("d_num"))
      val att = dist.select(col("source").as("src2"), col("v"), col("dn"))
      mx.join(broadcast(att),
          mx("source") === col("src2") && mx("d_num") === col("dn"))
        .groupBy(col("source"), col("n"), col("nr"), col("d_num"))
        .agg(min(col("v")).cast("long").as("d_at_v"))
        .withColumn("ks_x1e6", expr("(1000000 * d_num) div (n * nr)"))
        .select(col("source"), col("n"), col("nr").as("n_ref"), col("d_num"),
          col("d_at_v"), col("ks_x1e6"))
    },

    // CHI-SQUARE TEST OF INDEPENDENCE between event_type and day-of-
    // week: is traffic mix stable across the week? χ² = Σ (O−E)²/E
    // with E = row_tot·col_tot/n, cleared to the exact per-cell
    // integer ((n·O − rt·ct)²·10⁶) div (n·rt·ct) — summed per type
    // (the contribution report) and globally (the statistic), with
    // dof = (R−1)(C−1) on every row. Day-of-week derives from raw
    // epoch millis (epoch-day mod 7), identical arithmetic in both
    // engines — never a calendar function with engine-specific week
    // origin. Shapes: one partial-aggregable (type, dow) count is the
    // only data-sized pass; the dense contingency grid (types × 7,
    // zero-filled — empty cells still contribute E) and every marginal
    // live on bounded tables.
    "q173_chi_square" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val o = ev.select(col("event_type"), Tables.tsAsMillis(ev).as("ms"))
        .withColumn("dow", expr("(ms div 86400000) % 7"))
        .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("o"))
      val rt = o.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
      val ct = o.groupBy(col("dow")).agg(sum(col("o")).as("ct"))
      val grid = rt.crossJoin(broadcast(ct))
        .join(o, Seq("event_type", "dow"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
      def dec(c: String): String = s"CAST($c AS DECIMAL(38,0))"
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cells = grid
        .withColumn("n", sum(col("o")).over(all))
        .withColumn("dd", expr(s"${dec("n")} * o - ${dec("rt")} * ct"))
        .withColumn("contrib_x1e6", expr(
          s"CAST((dd * dd * 1000000) div (${dec("n")} * ${dec("rt")} * ct) AS BIGINT)"))
      val ncols = cells.agg(countDistinct(col("dow"))).collect()(0).getLong(0)
      cells.groupBy(col("event_type"))
        .agg(max(col("rt")).as("n_type"),
          sum(col("contrib_x1e6")).as("chi2_contrib_x1e6"))
        .withColumn("chi2_x1e6", sum(col("chi2_contrib_x1e6")).over(all))
        .withColumn("dof", (count(lit(1)).over(all) - lit(1L)) * lit(ncols - 1L))
        .select(col("event_type"), col("n_type"), col("chi2_contrib_x1e6"),
          col("chi2_x1e6"), col("dof"))
    },

    // QUANTILE NORMALIZATION of per-source document-length
    // distributions onto the global distribution — the batch-effect
    // remover (microarray classic, equally the feature-normalization
    // step before mixing corpora): a document at the p-th quantile of
    // ITS source maps to the global value at the same quantile.
    // Exact integer definition: g = (C_s(v)·N) div n_s is the target
    // global position, qnorm = min value whose global cum count ≥ g —
    // an inverse-CDF lookup solved WITHOUT a quadratic join by the
    // q32 as-of decomposition: global-value rows (at position G(v'))
    // and query rows (at position g) union into one stream, and a
    // running-min window over DESCENDING position hands each query
    // the smallest qualifying value (value rows tie-break first, so
    // G = g qualifies). Output one row per present (source, value).
    // Shapes: everything lives on value-domain-bounded tables — the
    // only corpus pass is the (source, value) count; the as-of stream
    // is |sources|·|values| + |values| rows.
    "q185_quantile_normalize" -> { (s, d) =>
      val cnt = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      // per-source inclusive ECDF + totals via the shared value-domain
      // operator (q130's decomposition): windows run over (source, v)
      // rows, never corpus rows
      val sv = graft.operators.ValueDomainStats.withGroupTotal(
        graft.operators.ValueDomainStats.cumFreq(cnt, "source", "v", "c"),
        "source", "c").withColumnRenamed("ntot", "ns")
      val gTot = cnt.agg(sum(col("c"))).collect()(0).getLong(0)
      val wG = Window.orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gcum = cnt.groupBy(col("v")).agg(sum(col("c")).as("gc"))
        .withColumn("gcum", sum(col("gc")).over(wG))
      // as-of stream: tag 0 = global value rows, tag 1 = query rows
      val stream = gcum.select(col("gcum").as("pos"), lit(0).as("tag"),
          col("v").as("gv"), lit(null).cast("string").as("source"),
          lit(null).cast("long").as("v"), lit(null).cast("long").as("c"))
        .unionByName(sv.select(
          expr(s"(cum * ${gTot}L) div ns").as("pos"), lit(1).as("tag"),
          lit(null).cast("long").as("gv"), col("source"), col("v"), col("c")))
      val wAsOf = Window.orderBy(col("pos").desc, col("tag").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      stream.withColumn("qnorm", min(col("gv")).over(wAsOf))
        .filter(col("tag") === 1)
        .select(col("source"), col("v").as("n_chars"), col("c").as("n_docs"),
          col("qnorm"))
    },

    // MANN–WHITNEY U / rank-sum test of every source against the
    // reference — the nonparametric "is this source's length
    // distribution stochastically larger?" companion to q172's KS
    // (which sees shape; U sees direction). Exact via q171's doubled
    // tie-midpoint ranks over each PAIR's combined sample: at value v,
    // 2·avg_rank = 2·(combined count < v) + (combined count at v) + 1,
    // so 2·U_s = Σ_v c_s(v)·avg2(v) − n_s(n_s+1), and the effect size
    // ships as AUC·10⁶ = 10⁶·U_s div (n_s·n_ref) (the probability of
    // superiority). Shapes: the pairwise combined ranking needs no
    // per-pair re-sort — it reads off the SHARED dense ECDF grid
    // (q172's, value-domain bounded) with the reference column
    // broadcast; the only corpus pass is the (source, value) count.
    "q186_mannwhitney" -> { (s, d) =>
      val cnt = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      val vals = cnt.select(col("v")).distinct()
      val srcs = cnt.groupBy(col("source")).agg(sum(col("c")).as("ns"))
      val dense = srcs.crossJoin(broadcast(vals))
        .join(cnt, Seq("source", "v"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val ecdf = graft.operators.ValueDomainStats.cumFreq(dense, "source", "v", "c")
      val ref = ecdf.filter(col("source") === "src0")
        .select(col("v"), col("ns").as("nr"), col("c").as("cr"),
          col("cum").as("cumr"))
      ecdf.filter(col("source") =!= "src0")
        .join(broadcast(ref), Seq("v"))
        .withColumn("avg2", lit(2L) * (col("cum") - col("c") + col("cumr") - col("cr"))
          + col("c") + col("cr") + lit(1L))
        .groupBy(col("source"))
        .agg(max(col("ns")).as("n"), max(col("nr")).as("n_ref"),
          sum(col("c") * col("avg2")).as("r1_2"))
        .withColumn("u2", col("r1_2") - col("n") * (col("n") + lit(1L)))
        .withColumn("auc_x1e6", expr("(1000000 * u2) div (2 * n * n_ref)"))
        .select(col("source"), col("n"), col("n_ref"), col("u2"),
          col("auc_x1e6"))
    },

    // POISSON BOOTSTRAP confidence interval for each source's mean
    // document length — distributed uncertainty quantification done
    // the way a cluster actually does it (Chamandy et al., "Estimating
    // Uncertainty for Massive Data Streams": per-row independent
    // Poisson(1) weights replace the impossible global resample).
    // Made DETERMINISTIC and engine-portable the q145/q149 way: the
    // replicate-b weight for a doc is the count of published
    // Poisson(1) CDF thresholds (×2⁵² integer constants) under the
    // doc's 52-bit md5-derived draw — no RNG state, identical in both
    // engines. B = 64 replicates; each replicate mean is one integral
    // divide; the 95% interval is an exact rank pick (2nd and 63rd of
    // the 64 sorted means — deterministic, no interpolation). Shapes:
    // the B-explode multiplies DOCUMENT rows (not tokens) by 64 and
    // partial-aggregates straight back to |sources|·B cells; the
    // rank pick runs on the bounded replicate table.
    "q187_bootstrap_ci" -> { (s, d) =>
      val thresholds = Seq(1656781714176974L, 3313563428353948L,
        4141954285442435L, 4418084571138597L, 4487117142562638L,
        4500923656847446L, 4503224742561580L)
      val tArr = thresholds.mkString("array(", "L, ", "L)")
      // fanOut first: the driver table is ONE scan partition, and the
      // B-explode + per-replicate digest chain is the heavy narrow
      // stage — serialized it was measured 26 s at sf1, fanned out 2.2 s
      val reps = Tables.fanOut(Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars")))
        .select(col("source"), col("doc_id"), col("n_chars"),
          explode(sequence(lit(0), lit(63))).as("b"))
        .withColumn("h", expr(
          "CAST(conv(substring(md5(concat(CAST(b AS STRING), ':', CAST(doc_id AS STRING))), 1, 13), 16, 10) AS BIGINT)"))
        .withColumn("w", expr(s"size(filter($tArr, t -> h >= t))").cast("long"))
        .groupBy(col("source"), col("b"))
        .agg(sum(col("w") * col("n_chars")).as("wx"), sum(col("w")).as("ws"))
        .withColumn("mean_x100", expr(
          "CASE WHEN ws = 0 THEN CAST(0 AS BIGINT) ELSE (100 * wx) div ws END"))
      val wRank = Window.partitionBy(col("source"))
        .orderBy(col("mean_x100").asc, col("b").asc)
      val ranked = reps.withColumn("rn", row_number().over(wRank))
      val base = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          expr("(100 * sum(n_chars)) div count(1)").as("mean_x100"))
      base
        .join(ranked.filter(col("rn") === 2)
          .select(col("source"), col("mean_x100").as("ci_lo_x100")), Seq("source"))
        .join(ranked.filter(col("rn") === 63)
          .select(col("source"), col("mean_x100").as("ci_hi_x100")), Seq("source"))
        .select(col("source"), col("n"), col("mean_x100"),
          col("ci_lo_x100"), col("ci_hi_x100"))
    },

    // BENFORD'S LAW first-digit audit of order totals (in cents) — the
    // forensic data-quality screen (fabricated or truncated monetary
    // data drifts from log₁₀(1+1/d)). The expected distribution is
    // irrational, so both engines carry the same ×10⁶ integer
    // constants (published to six digits); observed shares and
    // deviations are exact integral divides, and Nigrini's MAD·10⁶ =
    // Σ|dev| div 9 rides on every row. Digits 1..9 are DENSELY
    // emitted (a digit with zero observations still reports its
    // Benford deficit). Shapes: first digit is a narrow map (leading
    // char of the cents string — no logs, no floats), then ONE
    // partial-aggregable 9-key aggregate; everything after is
    // 9-row-bounded.
    "q181_benford" -> { (s, d) =>
      val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
        66947L, 57992L, 51153L, 45757L)
      val obs = Tables.orders(s, d)
        .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .withColumn("digit", expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)"))
        .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
      val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val bArr = benford.mkString("array(", "L, ", "L)")
      s.range(1, 10).select(col("id").as("digit"))
        .join(obs, Seq("digit"), "left")
        .withColumn("observed", coalesce(col("observed"), lit(0L)))
        .withColumn("n", sum(col("observed")).over(all))
        .withColumn("obs_x1e6", expr("(1000000 * observed) div n"))
        .withColumn("benford_x1e6", expr(s"element_at($bArr, CAST(digit AS INT))"))
        .withColumn("dev_x1e6", col("obs_x1e6") - col("benford_x1e6"))
        .withColumn("sad", sum(abs(col("dev_x1e6"))).over(all))
        .withColumn("mad_x1e6", expr("sad div 9"))
        .select(col("digit"), col("observed"), col("obs_x1e6"),
          col("benford_x1e6"), col("dev_x1e6"), col("mad_x1e6"))
    }
  )

  val oracle: Map[String, String] = Map(

    "q171_spearman" ->
      """WITH base AS (SELECT source, n_chars AS x,
             len(list_filter(string_split(text, ' '), t -> len(t) > 0))::BIGINT AS y
           FROM documents),
          rx AS (SELECT source, x,
                   (2 * (sum(cnt) OVER (PARTITION BY source ORDER BY x) - cnt)
                    + cnt + 1)::BIGINT AS rx2
                 FROM (SELECT source, x, count(*)::BIGINT AS cnt
                       FROM base GROUP BY 1, 2)),
          ry AS (SELECT source, y,
                   (2 * (sum(cnt) OVER (PARTITION BY source ORDER BY y) - cnt)
                    + cnt + 1)::BIGINT AS ry2
                 FROM (SELECT source, y, count(*)::BIGINT AS cnt
                       FROM base GROUP BY 1, 2)),
          m AS (SELECT b.source, count(*)::BIGINT AS n,
                  sum(rx2)::BIGINT AS sx, sum(ry2)::BIGINT AS sy,
                  sum(rx2 * rx2)::BIGINT AS sxx, sum(ry2 * ry2)::BIGINT AS syy,
                  sum(rx2 * ry2)::BIGINT AS sxy
                FROM base b JOIN rx USING (source, x) JOIN ry USING (source, y)
                GROUP BY 1),
          dd AS (SELECT *,
                   (n::HUGEINT * sxy - sx::HUGEINT * sy)::BIGINT AS num,
                   (n::HUGEINT * sxx - sx::HUGEINT * sx)::BIGINT AS dxx,
                   (n::HUGEINT * syy - sy::HUGEINT * sy)::BIGINT AS dyy
                 FROM m)
         SELECT source, n, num AS rho_num, dxx, dyy,
                (CASE WHEN dxx = 0 OR dyy = 0 THEN 0
                      ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                           * ((num::HUGEINT * num * 1000000000000)
                              // (dxx::HUGEINT * dyy)) END)::BIGINT AS rho2s_x1e12
         FROM dd""",

    "q172_ks_test" ->
      """WITH cnt AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c
           FROM documents GROUP BY 1, 2),
          vals AS (SELECT DISTINCT v FROM cnt),
          srcs AS (SELECT source, sum(c)::BIGINT AS ns FROM cnt GROUP BY 1),
          dense AS (SELECT s.source, s.ns, va.v, coalesce(c.c, 0)::BIGINT AS c
                    FROM srcs s CROSS JOIN vals va
                    LEFT JOIN cnt c ON c.source = s.source AND c.v = va.v),
          ecdf AS (SELECT source, ns, v,
                     sum(c) OVER (PARTITION BY source ORDER BY v)::BIGINT AS cum
                   FROM dense),
          ref AS (SELECT v, ns AS n_ref, cum AS cum_ref FROM ecdf
                  WHERE source = 'src0'),
          dist AS (SELECT e.source, e.ns, r.n_ref, e.v,
                     abs(r.n_ref * e.cum - e.ns * r.cum_ref)::BIGINT AS dn
                   FROM ecdf e JOIN ref r USING (v) WHERE e.source <> 'src0'),
          mx AS (SELECT source, max(ns)::BIGINT AS n, max(n_ref)::BIGINT AS n_ref,
                   max(dn)::BIGINT AS d_num
                 FROM dist GROUP BY 1)
         SELECT m.source, m.n, m.n_ref, m.d_num,
                min(d.v)::BIGINT AS d_at_v,
                ((1000000 * m.d_num) // (m.n * m.n_ref))::BIGINT AS ks_x1e6
         FROM mx m JOIN dist d ON d.source = m.source AND d.dn = m.d_num
         GROUP BY 1, 2, 3, 4""",

    "q173_chi_square" ->
      """WITH o AS (SELECT event_type, (epoch_ms(ts) // 86400000) % 7 AS dow,
             count(*)::BIGINT AS o
           FROM events GROUP BY 1, 2),
          rt AS (SELECT event_type, sum(o)::BIGINT AS rt FROM o GROUP BY 1),
          ct AS (SELECT dow, sum(o)::BIGINT AS ct FROM o GROUP BY 1),
          n AS (SELECT sum(o)::BIGINT AS n FROM o),
          grid AS (SELECT rt.event_type, ct.dow, rt.rt, ct.ct, n.n,
                     coalesce(o.o, 0)::BIGINT AS o
                   FROM rt CROSS JOIN ct
                   LEFT JOIN o ON o.event_type = rt.event_type AND o.dow = ct.dow, n),
          cells AS (SELECT *,
                      (n::HUGEINT * o - rt::HUGEINT * ct) AS dd
                    FROM grid),
          per AS (SELECT event_type, max(rt)::BIGINT AS n_type,
                    sum((dd * dd * 1000000) // (n::HUGEINT * rt * ct))::BIGINT
                      AS chi2_contrib_x1e6
                  FROM cells GROUP BY 1),
          c AS (SELECT count(*)::BIGINT AS ncols FROM ct)
         SELECT event_type, n_type, chi2_contrib_x1e6,
                sum(chi2_contrib_x1e6) OVER ()::BIGINT AS chi2_x1e6,
                ((count(*) OVER () - 1) * (c.ncols - 1))::BIGINT AS dof
         FROM per, c""",

    "q187_bootstrap_ci" ->
      """WITH reps AS (SELECT source, doc_id, n_chars,
             unnest(generate_series(0, 63)) AS b
           FROM documents),
          hw AS (SELECT source, b, n_chars,
                   len(list_filter([1656781714176974, 3313563428353948,
                     4141954285442435, 4418084571138597, 4487117142562638,
                     4500923656847446, 4503224742561580],
                     t -> ('0x' || substr(md5(b::VARCHAR || ':'
                       || doc_id::VARCHAR), 1, 13))::BIGINT >= t))::BIGINT AS w
                 FROM reps),
          agg AS (SELECT source, b, sum(w * n_chars)::BIGINT AS wx,
                    sum(w)::BIGINT AS ws
                  FROM hw GROUP BY 1, 2),
          m AS (SELECT source, b,
                  (CASE WHEN ws = 0 THEN 0
                        ELSE (100 * wx) // ws END)::BIGINT AS mean_x100
                FROM agg),
          r AS (SELECT source, mean_x100,
                  row_number() OVER (PARTITION BY source
                    ORDER BY mean_x100, b) AS rn
                FROM m),
          base AS (SELECT source, count(*)::BIGINT AS n,
                     ((100 * sum(n_chars)) // count(*))::BIGINT AS mean_x100
                   FROM documents GROUP BY 1)
         SELECT base.source, base.n, base.mean_x100,
                lo.mean_x100 AS ci_lo_x100, hi.mean_x100 AS ci_hi_x100
         FROM base
         JOIN (SELECT source, mean_x100 FROM r WHERE rn = 2) lo USING (source)
         JOIN (SELECT source, mean_x100 FROM r WHERE rn = 63) hi USING (source)""",

    // the structurally opposite route: a direct bounded inverse-CDF
    // join instead of the engine's as-of stream — a real cross-check
    "q185_quantile_normalize" ->
      """WITH cnt AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c
           FROM documents GROUP BY 1, 2),
          sv AS (SELECT *,
                   sum(c) OVER (PARTITION BY source ORDER BY v)::BIGINT AS cum,
                   sum(c) OVER (PARTITION BY source)::BIGINT AS ns
                 FROM cnt),
          n AS (SELECT sum(c)::BIGINT AS n FROM cnt),
          g AS (SELECT v, sum(c)::BIGINT AS gc FROM cnt GROUP BY 1),
          gcum AS (SELECT v, sum(gc) OVER (ORDER BY v)::BIGINT AS gcum FROM g),
          q AS (SELECT s.source, s.v, s.c, (s.cum * n.n) // s.ns AS pos
                FROM sv s, n)
         SELECT q.source, q.v AS n_chars, q.c AS n_docs,
                min(gc.v)::BIGINT AS qnorm
         FROM q JOIN gcum gc ON gc.gcum >= q.pos
         GROUP BY 1, 2, 3""",

    "q186_mannwhitney" ->
      """WITH cnt AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c
           FROM documents GROUP BY 1, 2),
          vals AS (SELECT DISTINCT v FROM cnt),
          srcs AS (SELECT source, sum(c)::BIGINT AS ns FROM cnt GROUP BY 1),
          dense AS (SELECT s.source, s.ns, va.v, coalesce(c.c, 0)::BIGINT AS c
                    FROM srcs s CROSS JOIN vals va
                    LEFT JOIN cnt c ON c.source = s.source AND c.v = va.v),
          ecdf AS (SELECT source, ns, v, c,
                     sum(c) OVER (PARTITION BY source ORDER BY v)::BIGINT AS cum
                   FROM dense),
          ref AS (SELECT v, ns AS nr, c AS cr, cum AS cumr FROM ecdf
                  WHERE source = 'src0'),
          rs AS (SELECT e.source, max(e.ns)::BIGINT AS n,
                   max(r.nr)::BIGINT AS n_ref,
                   sum(e.c * (2 * (e.cum - e.c + r.cumr - r.cr)
                       + e.c + r.cr + 1))::BIGINT AS r1_2
                 FROM ecdf e JOIN ref r USING (v)
                 WHERE e.source <> 'src0' GROUP BY 1)
         SELECT source, n, n_ref,
                (r1_2 - n * (n + 1))::BIGINT AS u2,
                ((1000000 * (r1_2 - n * (n + 1))) // (2 * n * n_ref))::BIGINT
                  AS auc_x1e6
         FROM rs""",

    "q181_benford" ->
      """WITH cents AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             AS BIGINT) AS cents FROM orders),
          obs AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                    AS digit, count(*)::BIGINT AS observed
                  FROM cents GROUP BY 1),
          digits AS (SELECT unnest(generate_series(1, 9)) AS digit),
          bf AS (SELECT [301030, 176091, 124939, 96910, 79181,
                         66947, 57992, 51153, 45757] AS b),
          dense AS (SELECT d.digit, coalesce(o.observed, 0)::BIGINT AS observed
                    FROM digits d LEFT JOIN obs o ON o.digit = d.digit),
          n AS (SELECT sum(observed)::BIGINT AS n FROM dense),
          rows_ AS (SELECT digit, observed,
                      ((1000000 * observed) // n.n)::BIGINT AS obs_x1e6,
                      bf.b[digit::INT]::BIGINT AS benford_x1e6
                    FROM dense, n, bf)
         SELECT digit::BIGINT AS digit, observed, obs_x1e6, benford_x1e6,
                (obs_x1e6 - benford_x1e6)::BIGINT AS dev_x1e6,
                (sum(abs(obs_x1e6 - benford_x1e6)) OVER () // 9)::BIGINT
                  AS mad_x1e6
         FROM rows_"""
  )
}
