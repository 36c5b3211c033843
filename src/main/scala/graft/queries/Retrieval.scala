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
    "q154_bm25" -> { (s, d) =>
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
      val scored = tf.join(broadcast(idf), "t").join(dl, "doc_id")
        .withColumn("term_score", expr(
          s"(idf_q * tf * 22 * (100 * $avgdl) * 1000) div " +
            s"(10 * tf * 100 * $avgdl + 12 * (25 * $avgdl + 75 * dl))"))
        .groupBy(col("doc_id"))
        .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms"))
      scored.orderBy(col("score").desc, col("doc_id").asc).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
        .select(col("rank"), col("doc_id"), col("n_terms"), col("score"))
    }
  )

  val oracle: Map[String, String] = Map(

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
         FROM sc ORDER BY score DESC, doc_id LIMIT 20"""
  )
}
