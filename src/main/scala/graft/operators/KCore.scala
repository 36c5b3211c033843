package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-core extraction — the dense-subgraph peel: repeatedly delete every
  * node of degree < k until the fixpoint; what survives is the maximal
  * subgraph of min-degree ≥ k (community cores, spam-farm detection,
  * the densest-region seed).
  *
  * Distributed shape per round: ONE partial-aggregable degree count
  * over the u<v half-edge list (degrees from the endpoint union — the
  * symmetric doubled list pays 2× per checkpoint and per anti-join
  * round for nothing the union-groupBy doesn't give) + one anti-join
  * against the peel-front kill set — the textbook BSP k-core round.
  * Each round's frontier is localCheckpointed so the plan never
  * re-derives prior rounds through lineage. Peel fronts are usually
  * small (broadcast-able) but the anti-join is left unhinted: a deep
  * peel's front can be graph-sized, and AQE picks broadcast when it
  * fits.
  *
  * K-core is a FIXPOINT semantic, not a fixed-iteration semantic like
  * damped PageRank, so a round cap alone would silently return a
  * not-yet-core subgraph on a deep-peel graph. The cap exists for
  * bounded-cost parity with an unrolled SQL oracle, but the result
  * carries an explicit `converged` bit (derived for free from the final
  * min-degree — no extra job), and `strict = true` makes
  * non-convergence throw instead of returning a partial peel (the
  * [[DedupClusters]] discipline).
  */
object KCore {

  /** One peel outcome. `converged` = the post-cap edge set has no node
    * of degree < k (min-degree ≥ k, or the core is empty) — i.e. the
    * capped result IS the k-core, not a truncation of it. Nodes whose
    * last edge vanishes mid-peel (orphans) are neither core nor
    * removed: degrees are edge-derived, so a degree-0 node simply
    * leaves the graph (n_nodes = n_core + n_removed + orphans). */
  final case class PeelResult(k: Long, nNodes: Long, nCore: Long,
                              nRemoved: Long, nRounds: Long,
                              coreEdges: Long, coreMinDeg: Long,
                              converged: Boolean)

  /** Peel `halfEdges` (columns `u`, `v`, one row per undirected edge
    * with u < v) down to the k-core, capped at `maxRounds` BSP rounds. */
  def peel(halfEdges: DataFrame, k: Int, maxRounds: Int,
           strict: Boolean = false): PeelResult = {
    def degOf(df: DataFrame): DataFrame =
      df.select(col("u").as("node")).unionAll(df.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("c"))
    var e = halfEdges.localCheckpoint()
    val nNodes = degOf(e).count()
    var rounds = 0L
    var removed = 0L
    var done = false
    var i = 0
    while (i < maxRounds && !done) {
      val bad = degOf(e).filter(col("c") < k)
        .select(col("node").as("b")).localCheckpoint()
      val nBad = bad.count()
      if (nBad == 0) done = true
      else {
        rounds += 1
        removed += nBad
        e = e.join(bad, col("u") === col("b"), "left_anti")
          .join(bad, col("v") === col("b"), "left_anti")
          .localCheckpoint()
      }
      i += 1
    }
    // core size / min-degree / edge count in ONE bounded job; the same
    // min-degree answers convergence (md ≥ k, or an empty core's -1
    // sentinel ⇒ no sub-k node remains ⇒ fixpoint reached)
    val st = degOf(e)
      .agg(count(lit(1)).as("nc"), coalesce(min(col("c")), lit(-1L)).as("md"),
        coalesce(sum(col("c")), lit(0L)).as("sd")).collect()(0)
    val md = st.getLong(1)
    val converged = done || md == -1L || md >= k
    if (strict && !converged)
      throw new IllegalStateException(
        s"k-core peel did not converge in $maxRounds rounds: " +
          s"min remaining degree $md < k=$k — raise maxRounds or accept a flagged partial peel")
    PeelResult(k.toLong, nNodes, st.getLong(0), removed, rounds,
      st.getLong(2) / 2, md, converged)
  }
}
