package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text RETRIEVAL over the corpus: BM25 ranked search — the scoring
  * face of the inverted-index family (q34 TF-IDF feature extraction,
  * q103 vocabulary, q116 collocations are the build faces). Engine
  * portability discipline as everywhere: the ONE transcendental in
  * BM25 (the idf log) is quantized to floor-log2 via length(bin(x)) —
  * identical in Spark and DuckDB — and every other factor is exact
  * integer arithmetic, so the ranking hash-matches across engines.
  */
object Retrieval {

  /** The standing query — four corpus-vocabulary terms. */
  private val Terms = Seq("spark", "join", "window", "stream")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 top-20 (k1 = 1.2, b = 0.75, the Robertson defaults, carried
    // as the exact rationals 12/10 and 75/100): score(d) =
    // Σ_t idf_q(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), scaled by
    // 1000·100·avgdl so the division is one integral divide. idf_q is
    // the floor-log2 quantization of the BM25 ratio (N−df+1)/(df+1)
    // pre-scaled ×1024: monotone in the true idf, zero floats,
    // portable bit-for-bit. Shapes: the document-length table is one
    // partial-aggregable corpus pass; the tf pass touches only
    // postings of the |Q| query terms; (N, avgdl) ride back as 1-row
    // bounded scalars; the |Q|-row idf table broadcasts; the final
    // top-20 plans as TakeOrdered (map-side k rows, never a global
    // sort). At index scale the dl table is the stored doc-length
    // column every search engine keeps — here it is derived in the
    // same job for self-containment.
    // PHRASE SEARCH via POSITIONAL postings — the retrieval face BM25
    // (q154) can't serve: "table hash" must match only where the terms
    // are ADJACENT. The index shape is the real one (term → (doc,
    // position) postings); the phrase resolves as a positional
    // self-join between the two terms' postings with pos₂ = pos₁ + 1.
    // Scale: the corpus is position-exploded once, but the join sides
    // are FILTERED TO THE QUERY TERMS before any shuffle — join input
    // is |postings("table")| + |postings("hash")|, never corpus-sized,
    // and the doc-grouped counts collapse into a TakeOrdered top-20
    // (the q154/q178 posture; a longer phrase chains one positional
    // join per extra term).
    "q216_phrase_search" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      val t1 = toks.filter(col("token") === "table").select(col("doc_id"), col("pos").as("p1"))
      val t2 = toks.filter(col("token") === "hash").select(col("doc_id"), col("pos").as("p2"))
      val hits = t1.join(t2, Seq("doc_id")).filter(col("p2") === col("p1") + 1)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
        .orderBy(col("hits").desc, col("doc_id").asc).limit(20)
      hits.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("hits").desc, col("doc_id").asc))
        .cast("long"))
        .select(col("rank"), col("doc_id"), col("hits"))
    },

    "q154_bm25" -> { (s, d) =>
      bm25Scored(s, d).orderBy(col("score").desc, col("doc_id").asc).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
        .select(col("rank"), col("doc_id"), col("n_terms"), col("score"))
    },

    // RECIPROCAL RANK FUSION of the two retrieval faces: the BM25
    // lexical ranking (q154's scorer) and a dense-embedding ranking
    // against the standing query vector (vec_id 0), fused by
    // RRF(d) = Σ_rankers 1/(60 + rank_r(d)) — Cormack et al.'s
    // hybrid-search combiner, the standard first stage of a RAG
    // retrieval stack. Engine portability: the dense score is the
    // EXACT integer dot product of ×1000-quantized components (the
    // q122 round-through-DOUBLE convention — float sum order can
    // never flip a rank), and RRF·10⁸ sums integral divides, so the
    // fused ranking hash-matches bit-for-bit. A doc absent from one
    // ranker's top-100 contributes 0 from that ranker and reports
    // rank −1, never NULL. Shapes: both rankers end in TakeOrdered
    // top-100 (map-side k rows); the fusion itself is a full outer
    // join of two 100-row lists — driver-scale, broadcast-trivial at
    // any corpus size. The dense leg is the q18 brute-force pass
    // (one narrow map over the corpus); at index scale its top-100
    // comes from q19/q19b's bucketed ANN instead — the fusion
    // contract is just (doc, rank) lists and does not change.
    "q178_rrf_fusion" -> { (s, d) =>
      val K = 100
      val bm = bm25Scored(s, d)
        .orderBy(col("score").desc, col("doc_id").asc).limit(K)
        .withColumn("bm25_rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
        .select(col("doc_id"), col("bm25_rank"))
      val emb = Tables.embeddings(s, d)
        .withColumn("q", expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000) AS BIGINT))"))
        .select(col("vec_id"), col("q"))
      val qv = emb.filter(col("vec_id") === 0L).select(col("q").as("qv"))
      val dense = emb.filter(col("vec_id") =!= 0L).crossJoin(broadcast(qv))
        .withColumn("dotq", expr(
          "aggregate(zip_with(q, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
        .orderBy(col("dotq").desc, col("vec_id").asc).limit(K)
        .withColumn("vec_rank", row_number().over(
          Window.orderBy(col("dotq").desc, col("vec_id").asc)).cast("long"))
        .select(col("vec_id").as("doc_id"), col("vec_rank"))
      bm.join(dense, Seq("doc_id"), "full_outer")
        .withColumn("rrf_x1e8",
          coalesce(expr("100000000 div (60 + bm25_rank)"), lit(0L)) +
            coalesce(expr("100000000 div (60 + vec_rank)"), lit(0L)))
        .withColumn("bm25_rank", coalesce(col("bm25_rank"), lit(-1L)))
        .withColumn("vec_rank", coalesce(col("vec_rank"), lit(-1L)))
        .orderBy(col("rrf_x1e8").desc, col("doc_id").asc).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf_x1e8").desc, col("doc_id").asc)).cast("long"))
        .select(col("rank"), col("doc_id"), col("bm25_rank"), col("vec_rank"),
          col("rrf_x1e8"))
    }
  )

  /** q154's BM25 scorer (k1 = 1.2, b = 0.75 as exact rationals, ×1000·
    * 100·avgdl scale, floor-log2 idf) — shared by the standalone
    * ranking and the q178 fusion. */
  private def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .localCheckpoint() // reused: corpus stats + the per-doc score join
    val st = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).collect()(0)
    val nDocs = st.getLong(0)
    val avgdl = st.getLong(1) / nDocs
    val tf = toks.filter(col("t").isin(Terms: _*))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .select(col("t"), expr(
        s"CAST(length(bin((($nDocs - df + 1) * 1024) div (df + 1))) AS BIGINT)").as("idf_q"))
    tf.join(broadcast(idf), "t").join(dl, "doc_id")
      .withColumn("term_score", expr(
        s"(idf_q * tf * 22 * (100 * $avgdl) * 1000) div " +
          s"(10 * tf * 100 * $avgdl + 12 * (25 * $avgdl + 75 * dl))"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms"))
  }

  val oracle: Map[String, String] = Map(

    // parallel unnest zips token and position (the q127-oracle shape);
    // bases differ across engines (0- vs 1-based) but only ADJACENCY
    // enters the result
    "q216_phrase_search" ->
      """WITH toks AS (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS token,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
               FROM documents),
          t1 AS (SELECT doc_id, pos FROM toks WHERE token = 'table'),
          t2 AS (SELECT doc_id, pos FROM toks WHERE token = 'hash'),
          h AS (SELECT t1.doc_id, count(*)::BIGINT AS hits
                FROM t1 JOIN t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
                GROUP BY 1)
         SELECT row_number() OVER (ORDER BY hits DESC, doc_id) AS rank, doc_id, hits
         FROM h ORDER BY hits DESC, doc_id LIMIT 20""",

    "q154_bm25" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
           FROM documents),
          tok AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
          dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
          st AS (SELECT count(*)::BIGINT AS n,
                   (sum(dl) // count(*))::BIGINT AS avgdl FROM dl),
          tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tok
                 WHERE t IN ('spark', 'join', 'window', 'stream') GROUP BY 1, 2),
          df AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
          idf AS (SELECT t,
                    length(bin(((st.n - df + 1) * 1024) // (df + 1)))::BIGINT AS idf_q
                  FROM df, st),
          sc AS (SELECT tf.doc_id,
                   sum((idf_q * tf * 22 * (100 * st.avgdl) * 1000) //
                       (10 * tf * 100 * st.avgdl
                        + 12 * (25 * st.avgdl + 75 * dl.dl)))::BIGINT AS score,
                   count(*)::BIGINT AS n_terms
                 FROM tf JOIN idf USING (t) JOIN dl USING (doc_id), st
                 GROUP BY 1)
         SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
                doc_id, n_terms, score
         FROM sc ORDER BY score DESC, doc_id LIMIT 20""",

    "q178_rrf_fusion" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
           FROM documents),
          tok AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
          dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
          st AS (SELECT count(*)::BIGINT AS n,
                   (sum(dl) // count(*))::BIGINT AS avgdl FROM dl),
          tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tok
                 WHERE t IN ('spark', 'join', 'window', 'stream') GROUP BY 1, 2),
          df AS (SELECT t, count(*)::BIGINT AS df FROM tf GROUP BY 1),
          idf AS (SELECT t,
                    length(bin(((st.n - df + 1) * 1024) // (df + 1)))::BIGINT AS idf_q
                  FROM df, st),
          sc AS (SELECT tf.doc_id,
                   sum((idf_q * tf * 22 * (100 * st.avgdl) * 1000) //
                       (10 * tf * 100 * st.avgdl
                        + 12 * (25 * st.avgdl + 75 * dl.dl)))::BIGINT AS score
                 FROM tf JOIN idf USING (t) JOIN dl USING (doc_id), st
                 GROUP BY 1),
          bm AS (SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
                 FROM sc ORDER BY score DESC, doc_id LIMIT 100),
          qe AS (SELECT vec_id,
                   list_transform(embedding,
                     v -> round(v::DOUBLE * 1000)::BIGINT) AS q
                 FROM embeddings),
          qv AS (SELECT q AS qv FROM qe WHERE vec_id = 0),
          dn AS (SELECT vec_id,
                   list_sum(list_transform(range(1, len(q) + 1),
                     i -> q[i] * qv[i]))::BIGINT AS dotq
                 FROM qe, qv WHERE vec_id <> 0),
          dv AS (SELECT vec_id AS doc_id,
                   row_number() OVER (ORDER BY dotq DESC, vec_id) AS vec_rank
                 FROM dn ORDER BY dotq DESC, vec_id LIMIT 100),
          f AS (SELECT coalesce(bm.doc_id, dv.doc_id) AS doc_id,
                  coalesce(100000000 // (60 + bm.bm25_rank), 0)
                    + coalesce(100000000 // (60 + dv.vec_rank), 0) AS rrf,
                  coalesce(bm.bm25_rank, -1) AS bm25_rank,
                  coalesce(dv.vec_rank, -1) AS vec_rank
                FROM bm FULL OUTER JOIN dv ON bm.doc_id = dv.doc_id)
         SELECT row_number() OVER (ORDER BY rrf DESC, doc_id)::BIGINT AS rank,
                doc_id, bm25_rank::BIGINT AS bm25_rank,
                vec_rank::BIGINT AS vec_rank, rrf::BIGINT AS rrf_x1e8
         FROM f ORDER BY rrf DESC, doc_id LIMIT 20"""
  )
}
