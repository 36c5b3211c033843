package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Coreset-style DATA SELECTION — the submodular-selection family a
  * training-data pipeline runs to pick a small, DIVERSE subset (seed
  * sets for active learning, eval-slice curation, prompt dedup beyond
  * near-duplicate removal).
  *
  * q210 is greedy k-CENTER (farthest-point traversal), the classic
  * 2-approximation to the k-center objective: start from a
  * deterministic seed, then repeatedly take the point FARTHEST from
  * the chosen set (max over points of min over centers). Distances are
  * exact integers on the shared 1e6 embedding quantization (the
  * q127/q62 discipline: floor(x·10⁶) per dimension, L2² in Long — 64
  * dims × (2·10⁶)² ≈ 2.6e14 per pair, far inside Long), with the
  * (distance DESC, vec_id ASC) tie-break mirrored by the oracle, so
  * the trajectory is bit-deterministic in both engines.
  *
  * 100 TB shape: each of the K rounds is one narrow corpus pass (a
  * crossJoin against the ≤K-row broadcast center table — no shuffle of
  * the corpus), a partial-aggregable per-vector min, and a
  * TakeOrdered(1) argmax; the driver holds only the K selected centers
  * (K·dims longs). K is the knob, corpus size never enters driver
  * memory — the same posture as q197's bounded driver fold.
  */
object Selection {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_kcenter_select" -> { (s, d) =>
      import s.implicits._
      val K = 4
      // quantize once; localCheckpoint because K rounds re-scan it
      val q = Tables.embeddings(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("qv"))
        .localCheckpoint()
      val first = q.orderBy(col("vec_id")).limit(1).as[(Long, Seq[Long])].collect()(0)
      // (vec_id, quantized vector, max-min distance at selection time)
      val centers = scala.collection.mutable.ArrayBuffer[(Long, Seq[Long], Long)](
        (first._1, first._2, 0L))
      while (centers.size < K) {
        val cDf = s.createDataFrame(centers.map(c => (c._1, c._2)).toSeq).toDF("cid", "cq")
        val (winId, winD2) = q.crossJoin(broadcast(cDf))
          .select(col("vec_id"),
            expr("aggregate(zip_with(qv, cq, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)")
              .as("dd"))
          .groupBy(col("vec_id")).agg(min(col("dd")).as("dmin2"))
          .orderBy(col("dmin2").desc, col("vec_id").asc).limit(1)
          .as[(Long, Long)].collect()(0)
        val winQ = q.filter(col("vec_id") === winId).as[(Long, Seq[Long])].collect()(0)._2
        centers += ((winId, winQ, winD2))
      }
      val out = centers.zipWithIndex.map { case ((id, _, d2), i) => ((i + 1).toLong, id, d2) }.toSeq
      s.createDataFrame(out).toDF("sel_order", "vec_id", "dmin2")
    }
  )

  val oracle: Map[String, String] = Map(
    // the same greedy trajectory, unrolled: cK = argmax of the running
    // min distance (least-chain) to the K-1 chosen centers; distances
    // on the position-exploded quantized table (the q127 oracle shape)
    "q210_kcenter_select" ->
      """WITH qe AS (SELECT vec_id,
                 unnest(range(1, len(embedding) + 1)) AS pos,
                 unnest(list_transform(embedding, x -> floor(x::DOUBLE * 1000000)::BIGINT)) AS qd
               FROM embeddings),
         c1 AS (SELECT min(vec_id) AS cid FROM embeddings),
         d1 AS (SELECT x.vec_id, sum((x.qd - y.qd) * (x.qd - y.qd))::BIGINT AS d2
                FROM qe x JOIN qe y ON x.pos = y.pos AND y.vec_id = (SELECT cid FROM c1)
                GROUP BY 1),
         c2 AS (SELECT vec_id AS cid, d2 FROM d1 ORDER BY d2 DESC, vec_id LIMIT 1),
         e2 AS (SELECT x.vec_id, sum((x.qd - y.qd) * (x.qd - y.qd))::BIGINT AS d2
                FROM qe x JOIN qe y ON x.pos = y.pos AND y.vec_id = (SELECT cid FROM c2)
                GROUP BY 1),
         m2 AS (SELECT d1.vec_id, least(d1.d2, e2.d2) AS d2 FROM d1 JOIN e2 USING (vec_id)),
         c3 AS (SELECT vec_id AS cid, d2 FROM m2 ORDER BY d2 DESC, vec_id LIMIT 1),
         e3 AS (SELECT x.vec_id, sum((x.qd - y.qd) * (x.qd - y.qd))::BIGINT AS d2
                FROM qe x JOIN qe y ON x.pos = y.pos AND y.vec_id = (SELECT cid FROM c3)
                GROUP BY 1),
         m3 AS (SELECT m2.vec_id, least(m2.d2, e3.d2) AS d2 FROM m2 JOIN e3 USING (vec_id)),
         c4 AS (SELECT vec_id AS cid, d2 FROM m3 ORDER BY d2 DESC, vec_id LIMIT 1)
         SELECT 1::BIGINT AS sel_order, cid AS vec_id, 0::BIGINT AS dmin2 FROM c1
         UNION ALL SELECT 2::BIGINT, cid, d2::BIGINT FROM c2
         UNION ALL SELECT 3::BIGINT, cid, d2::BIGINT FROM c3
         UNION ALL SELECT 4::BIGINT, cid, d2::BIGINT FROM c4"""
  )
}
