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
    },

    // Fuzzy (edit-distance) self-join — entity resolution over dirty
    // names. Two-level pruning keeps it EXACT but far from n²:
    // (1) intern the name dictionary — real-world name columns are
    // heavily repeated, so levenshtein runs once per distinct ORDERED
    // name pair, not once per row pair (64 names / 20k parts at sf0.1:
    // 4096 calls instead of 16M);
    // (2) length-band blocking inside the dictionary join — dist ≤ 3
    // forces |len(a)-len(b)| ≤ 3, so width-3 bands differ by ≤ 1: side
    // A explodes to band ± 1, side B keeps its own band, and the band
    // equi-join covers every qualifying ordered pair exactly once.
    // The fuzzy dictionary (bounded by matched name pairs) broadcasts;
    // part rows then flow through two equi-joins — no similarity
    // arithmetic ever touches a fact row. When the dictionary is NOT
    // small (genuinely unique strings), the escalation is q-gram
    // prefix filtering — SimilarityJoin over character n-grams.
    "q91_fuzzy_join" -> { (s, d) =>
      val p = Tables.part(s, d)
        .select(col("p_partkey").as("key"), col("p_name").as("name"),
          col("p_brand").as("brand"))
      val np = fuzzyNamePairs(s, d)
      val a = p.select(col("key").as("key_a"), col("name").as("name_a"), col("brand"))
      val b = p.select(col("key").as("key_b"), col("name").as("name_b"), col("brand"))
      a.join(broadcast(np), Seq("name_a"))
        .join(b, Seq("brand", "name_b"))
        .filter(col("key_a") < col("key_b"))
        .select(col("key_a"), col("key_b"), col("dist"))
    }
  )

  /** The q91 fuzzy DICTIONARY: every ordered distinct-name pair within
    * edit distance 3, found by length-band blocking (dist ≤ 3 forces
    * |len(a)−len(b)| ≤ 3, so width-3 bands differ by ≤ 1 and the band
    * equi-join meets every qualifying pair exactly once). Shared with
    * q110, whose supernode contraction runs connectivity over this
    * name-level graph instead of the fact rows. */
  private[queries] def fuzzyNamePairs(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
      .withColumn("band", expr("length(name) div 3"))
    val na = names.select(col("name").as("name_a"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
    na.join(names.select(col("name").as("name_b"), col("band")), Seq("band"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 3)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

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
         GROUP BY 1""",

    // The oracle is the UNBLOCKED fuzzy join — blocking must be
    // invisible (no length predicate needed: dist ≤ 3 implies it).
    "q91_fuzzy_join" ->
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS dist
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         WHERE levenshtein(a.p_name, b.p_name) <= 3"""
  )
}
