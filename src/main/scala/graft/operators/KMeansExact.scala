package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact fixed-point distributed k-means (Lloyd's algorithm) — the
  * deterministic complement of AnnIvf's sampled Spark-ML quantizer:
  * every quantity is an integer, so the clustering is bit-identical
  * across engines, task retries, and partitionings, and the driver's
  * DuckDB oracle can UNROLL the same iterations and hash-match the
  * result (the q92 PageRank strategy applied to an ML-adjacent
  * operator).
  *
  * Arithmetic: components quantize to micro-units (floor(x·10⁶), the
  * q93 convention); distances are integer sums of squares; centroid
  * updates are integer means (`sum div count`); the per-vector argmin
  * packs (dist², cluster) into ONE long — d2·16 + cid — so `min`
  * delivers the nearest centroid with a deterministic low-id tie-break.
  * Overflow headroom: |q| ≤ 10⁷ ⇒ dq² ≤ 4·10¹⁴, ×dim(64) ≤ 2.6·10¹⁶,
  * ×16 ≤ 4.1·10¹⁷ ≪ 2⁶³.
  *
  * Scale shape (the same loop structure Spark ML's KMeans runs):
  * centroids are a k×dim table — BOUNDED, collected to the driver
  * between rounds (k·dim longs, the driver-sized class of counters)
  * and shipped back inside a codegen'd expression, so ASSIGNMENT IS A
  * ZERO-SHUFFLE NARROW MAP over the vectors. Each update round is one
  * partial-aggregable shuffle on (cluster, pos) — k·dim groups.
  * Nothing grows with n except the narrow scans.
  *
  * Seeds are the k smallest vec_ids (deterministic, no RNG); a cluster
  * that loses all members simply drops out of the next round's
  * centroid table (both engines compute the same drop).
  */
object KMeansExact {

  private val Scale = 1000000L

  /** Final assignment after `rounds` Lloyd updates: (vec_id, cluster,
    * dist2) against the post-update centroids. k ≤ 16 (packed argmin
    * carries the cluster id in 4 bits). */
  def assignments(emb: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k > 0 && k <= 16, s"packed argmin carries the cluster id in 4 bits: k=$k")
    val q = emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT))").as("qv"))
      // read once per round (assignment) plus once per update — flat
      // lineage, no per-round parquet re-decode
      .localCheckpoint()

    // (cid, pos, cq) rows → the broadcastable PackedCentroids holder
    def toCentroids(rows: Array[(Long, Long, Long)]): graft.functions.PackedCentroids = {
      val byCid = rows.groupBy(_._1).toSeq.sortBy(_._1)
      graft.functions.PackedCentroids(
        byCid.map(_._1.toInt).toArray,
        byCid.map { case (_, ps) =>
          val v = new Array[Long](ps.map(_._2).max.toInt)
          ps.foreach { case (_, pos, cq) => v(pos.toInt - 1) = cq }
          v
        }.toArray)
    }
    def collectTriples(df: DataFrame): Array[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // seed centroids: the k smallest vec_ids, cid = vec_id (ids are
    // 0-based in the driver tables; any k distinct ids ≤ 15 work)
    var cents = toCentroids(collectTriples(
      q.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), posexplode(col("qv")).as(Seq("pos0", "cq")))
        .select(col("cid"), (col("pos0") + 1).cast("long").as("pos"), col("cq"))))
    // sparse or offset ids would seed < k clusters and make nearest()
    // return garbage silently — contract violations fail fast instead
    require(cents.cids.length == k,
      s"seeding expects dense 0-based vec_ids: found ${cents.cids.length} of $k seed vectors with vec_id < $k")

    def nearest(c: Column): Column =
      org.apache.spark.sql.GraftSqlGlue.column(
        graft.functions.NearestCentroidPacked(
          org.apache.spark.sql.GraftSqlGlue.expression(c), cents))

    (1 to rounds).foreach { _ =>
      cents = toCentroids(collectTriples(
        q.select(col("qv"), nearest(col("qv")).as("p"))
          .select(col("qv"), expr("p % 16").as("cluster"))
          .select(col("cluster"), posexplode(col("qv")).as(Seq("pos0", "qc")))
          .groupBy(col("cluster"), (col("pos0") + 1).cast("long").as("pos"))
          .agg(expr("sum(qc) div count(1)").as("cq"))))
    }
    q.select(col("vec_id"), nearest(col("qv")).as("p"))
      .select(col("vec_id"), expr("p % 16").as("cluster"), expr("p div 16").as("dist2"))
  }
}
