package graft.queries

import graft.functions.BloomKeyMightContain
import org.apache.spark.sql.{DataFrame, GraftSqlGlue, SparkSession}
import org.apache.spark.sql.functions._

/** Join-hardening operators for the two ways a 100 TB join goes bad:
  * shuffling fact rows that can never match (fixed by a bloom
  * prefilter on the scan side), and a handful of hot keys serializing
  * onto one task (fixed by a hot/cold split join). Both are EXACT —
  * the bloom only prunes and the split only re-routes; results
  * hash-match the plain join in DuckDB.
  */
object JoinHardening {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bloom-prefiltered semi join: urgent orders are ~20% of the dim —
    // too big to broadcast at scale, so the plain plan shuffles ALL of
    // lineitem. Instead: build a bloom over the dim keys (driver-side
    // sketch, ~1.2 MB per 1M keys at 1% fpp), probe it in whole-stage
    // codegen right on the fact scan, and let the exact semi join
    // remove the false positives. The exchange carries ~selectivity×n
    // rows instead of n. At 10⁹⁺ dim keys the single driver bloom
    // stops fitting (~1.2 GB) — the escalation is per-partition blooms
    // OR'd together (BloomFilter.mergeInPlace is associative), built in
    // a treeAggregate; same probe expression either way.
    "q74_bloom_join" -> { (s, d) =>
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val expected = math.max(dim.count(), 1000L)
      val bloom = dim.stat.bloomFilter("o_orderkey", expected, 0.01)
      val bytes = {
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        bos.toByteArray
      }
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .filter(GraftSqlGlue.column(
          BloomKeyMightContain(GraftSqlGlue.expression(col("l_orderkey")), bytes)))
      fact.join(dim, fact("l_orderkey") === dim("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    },

    // Hot/cold split join — the skew defense when AQE's skew-join can't
    // see the problem (e.g. the skew is born in an upstream transform,
    // not a scan stat). A planted hot key (75% of fact rows) would land
    // one task with 75% of the data in a plain shuffle join. Split:
    // keys above 10% of total (≤10 keys by pigeonhole, so the driver
    // list is bounded by construction) join via BROADCAST of their dim
    // slice — the hot fact rows never shuffle at all — and the cold
    // remainder takes the normal shuffle join. Union, then aggregate.
    "q75_skew_join" -> { (s, d) =>
      val fact = Tables.events(s, d).select(
        when(col("event_id") % 4 < 3, 0L).otherwise(col("user_id") + 1).as("k"),
        round(col("value") * 100).cast("long").as("vx"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_mktsegment"))
      val total = fact.count()
      val hot = fact.groupBy(col("k")).count()
        .filter(col("count") > total / 10)
        .select(col("k")).collect().map(_.getLong(0)).toSeq
      val joined =
        if (hot.isEmpty) fact.join(dim, Seq("k"))
        else {
          val hotJoin = fact.filter(col("k").isin(hot: _*))
            .join(broadcast(dim.filter(col("k").isin(hot: _*))), Seq("k"))
          val coldJoin = fact.filter(!col("k").isin(hot: _*))
            .join(dim.filter(!col("k").isin(hot: _*)), Seq("k"))
          hotJoin.unionAll(coldJoin)
        }
      joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("vx")).as("sum_vx"))
    }
  )

  val oracle: Map[String, String] = Map(

    // The oracle is the PLAIN semi join — the bloom must be invisible.
    "q74_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n,
           sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))::BIGINT AS sum_cents
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY 1""",

    // The oracle is the PLAIN join — the split must be invisible.
    "q75_skew_join" ->
      """WITH f AS (SELECT CASE WHEN event_id % 4 < 3 THEN 0 ELSE user_id + 1 END AS k,
             round(value * 100)::BIGINT AS vx
           FROM events)
         SELECT c.c_mktsegment, count(*) AS n, sum(f.vx)::BIGINT AS sum_vx
         FROM f JOIN customer c ON f.k = c.c_custkey
         GROUP BY 1"""
  )
}
