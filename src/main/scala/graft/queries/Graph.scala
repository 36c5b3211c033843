package graft.queries

import graft.operators.PageRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relationship tables. Connected components
  * (q40, operators/DedupClusters) covers the clustering face; this
  * module carries the centrality face. Oracle strategy: the iteration
  * count is fixed and small, so the DuckDB oracle UNROLLS the same
  * fixed-point update — both engines run exact integer arithmetic, so
  * the hash-match is bit-for-bit (see operators/PageRank).
  */
object Graph {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank over the bipartite part↔supplier sourcing graph
    // (distinct lineitem pairs, symmetrized). Part nodes get even ids,
    // suppliers odd — disjoint by construction. 3 damped iterations
    // (d = 0.85) in fixed-point; ranks are comparable across runs and
    // engines because no float ever enters the pipeline.
    "q92_pagerank" -> { (s, d) =>
      val e0 = Tables.lineitem(s, d)
        .select((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      PageRank.ranks(e, 3).select(col("id").as("node_id"), col("rank"))
    }
  )

  private def prOracle: String = {
    val scale = 1000000000000L
    def iter(k: Int): String =
      s"""s$k AS (SELECT e.dst AS id, sum(r.rank // r.outdeg) AS s
            FROM e JOIN r${k - 1} r ON e.src = r.id GROUP BY 1),
          r$k AS (SELECT d.id, d.outdeg,
              (15 * (SELECT base FROM p) + 85 * coalesce(s$k.s, 0)) // 100 AS rank
            FROM deg d LEFT JOIN s$k ON d.id = s$k.id)"""
    s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem),
         e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         deg AS (SELECT src AS id, count(*) AS outdeg FROM e GROUP BY 1),
         p AS (SELECT $scale // count(*) AS base FROM deg),
         r0 AS (SELECT id, outdeg, (SELECT base FROM p) AS rank FROM deg),
         ${iter(1)}, ${iter(2)}, ${iter(3)}
       SELECT id AS node_id, rank::BIGINT AS rank FROM r3"""
  }

  val oracle: Map[String, String] = Map(
    "q92_pagerank" -> prOracle
  )
}
