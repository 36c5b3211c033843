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
    },

    // Hierarchical SUBTREE rollup — the org-chart/BOM aggregation
    // pattern over the implicit binary tree parent(v) = v div 2 on doc
    // ids (dense ids ⇒ every parent exists; depth = bit length). The
    // scalable plan is ANCESTOR EXPANSION, not iteration: each row
    // emits its own O(log n) ancestor chain with a narrow
    // transform+distinct+explode (shiftright — no join, no loop), and
    // ONE partial-aggregable shuffle on the ancestor id produces every
    // node's subtree docs/chars. n·log n exploded rows beats log n
    // sequential join rounds at cluster scale (one exchange vs a
    // synchronization barrier per level). The ORACLE takes the
    // structurally opposite route — a DuckDB RECURSIVE CTE walking
    // ancestor edges — so the hash gate cross-checks an iterative
    // fixpoint against a closed-form expansion.
    "q148_tree_rollup" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("n_chars"), explode(expr(
          "array_distinct(transform(sequence(0, 31), i -> shiftright(doc_id, i)))")).as("node"))
        .groupBy(col("node"))
        .agg(count(lit(1)).as("subtree_docs"), sum(col("n_chars")).as("subtree_chars"))
        .withColumn("depth",
          expr("CASE WHEN node = 0 THEN 0 ELSE length(bin(node)) END").cast("long"))
        .select(col("node"), col("depth"), col("subtree_docs"), col("subtree_chars"))
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
    "q92_pagerank" -> prOracle,

    // recursive ancestor walk: (ancestor, descendant) pairs from each
    // doc up to the root, then one aggregate per ancestor — the
    // iterative mirror of the engine's closed-form expansion
    "q148_tree_rollup" ->
      """WITH RECURSIVE anc(node, leaf) AS (
           SELECT doc_id, doc_id FROM documents
           UNION ALL
           SELECT a.node // 2, a.leaf FROM anc a WHERE a.node > 0
         )
         SELECT a.node,
                (CASE WHEN a.node = 0 THEN 0 ELSE length(bin(a.node)) END)::BIGINT AS depth,
                count(*)::BIGINT AS subtree_docs,
                sum(d.n_chars)::BIGINT AS subtree_chars
         FROM anc a JOIN documents d ON a.leaf = d.doc_id
         GROUP BY 1"""
  )
}
