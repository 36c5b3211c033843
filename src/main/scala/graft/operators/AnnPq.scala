package graft.operators

import graft.functions.PackedCentroids
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al., PAMI'11) — the memory-side
  * complement of [[AnnLsh]] (no training, data-independent buckets) and
  * [[AnnIvf]] (coarse cells): each vector is ENCODED as m sub-space
  * codebook ids, the search scans CODES instead of vectors via
  * asymmetric distance computation (ADC: per query, one m×k table of
  * exact sub-distances; a candidate's distance is m table lookups), and
  * only a constant-size ADC short-list is re-ranked with exact cosine.
  * At 100 TB this is the operator that makes the corpus FIT: a
  * 64-float vector (256 B) becomes m = 8 codes (8 B) — the ADC scan
  * touches 3% of the bytes a brute-force pass reads.
  *
  * Scale shape: the codebook fit is CONSTANT in corpus size (driver
  * Lloyd on a deterministic bounded sample — the AnnIvf sampled-fit
  * budget, taken to its limit); encoding is a zero-shuffle narrow map
  * (the codebooks ride inside NearestCentroidPacked, the q109
  * machinery, one call per sub-space); the ADC scan is a
  * bounded-|Q|-broadcast over the code table; the exact re-rank
  * touches candN·|Q| vectors. Everything is seeded integer arithmetic
  * (micro-unit quantization), so runs are deterministic and the
  * planted-truth recall gate is meaningful.
  */
object AnnPq {

  /** micro-unit quantization scale, shared with KMeansExact. */
  private val Scale = 1000000L

  private def quantized: Column =
    expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT))")

  private def nearestPacked(c: Column, cents: PackedCentroids): Column =
    org.apache.spark.sql.GraftSqlGlue.column(
      graft.functions.NearestCentroidPacked(
        org.apache.spark.sql.GraftSqlGlue.expression(c), cents))

  private def dist2(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { val q = a(i) - b(i); d += q * q; i += 1 }
    d
  }

  /** Per-sub-space codebooks from driver-side Lloyd on a DETERMINISTIC
    * bounded sample (the `sampleN` smallest salted-hash vec_ids — a
    * uniform draw, reproducible across runs and engines). Constant
    * cost in corpus size; ksub ≤ 16 (the 4-bit pack). */
  def fitCodebooks(vecs: DataFrame, dims: Int, m: Int, ksub: Int,
                   sampleN: Int = 256, rounds: Int = 5): Array[PackedCentroids] = {
    require(dims % m == 0, s"dims $dims must split into $m sub-spaces")
    require(ksub > 0 && ksub <= 16, "4-bit pack: ksub <= 16")
    val dsub = dims / m
    val sample = vecs
      .select(col("vec_id"), quantized.as("qv"))
      .orderBy(
        expr("CAST(conv(substring(md5(concat('pq:', CAST(vec_id AS STRING))), 1, 15), 16, 10) AS BIGINT)").asc,
        col("vec_id").asc)
      .limit(sampleN)
      .collect().map(_.getSeq[Long](1).toArray)
    require(sample.nonEmpty, "empty corpus")
    (0 until m).map { j =>
      val subs = sample.map(_.slice(j * dsub, (j + 1) * dsub))
      // init: first ksub DISTINCT sub-vectors in sample order.
      // Distinct BY CONTENT (Array equality is reference equality, so a
      // bare .distinct would never dedupe and could seed duplicate
      // centroids that Lloyd ties-to-lower-index keeps empty forever,
      // silently shrinking the effective codebook below ksub).
      var cents: Array[Array[Long]] = {
        val seen = scala.collection.mutable.LinkedHashMap.empty[Seq[Long], Array[Long]]
        subs.iterator.foreach(v => seen.getOrElseUpdate(v.toSeq, v))
        seen.values.take(ksub).toArray
      }
      (1 to rounds).foreach { _ =>
        val assigned = subs.groupBy { v =>
          var best = 0; var bd = Long.MaxValue
          var c = 0
          while (c < cents.length) {
            val d = dist2(v, cents(c))
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          best
        }
        cents = cents.indices.map { c =>
          assigned.get(c) match {
            case Some(members) =>
              val sums = new Array[Long](dsub)
              members.foreach(v => (0 until dsub).foreach(i => sums(i) += v(i)))
              sums.map(_ / members.length) // integer mean, matches KMeansExact
            case None => cents(c) // empty cell keeps its centroid
          }
        }.toArray
      }
      PackedCentroids(cents.indices.toArray, cents)
    }.toArray
  }

  /** PQ encode: m codes per vector — a zero-shuffle narrow map, one
    * in-register argmin per sub-space. Output keeps the raw embedding
    * for the exact re-rank stage. */
  def encode(vecs: DataFrame, books: Array[PackedCentroids], dims: Int): DataFrame = {
    val dsub = dims / books.length
    val codeCols = books.zipWithIndex.map { case (b, j) =>
      (nearestPacked(expr(s"slice(__qv, ${j * dsub + 1}, $dsub)"), b) % 16).cast("int")
    }
    vecs.withColumn("__qv", quantized)
      .select(col("vec_id"), col("embedding"), array(codeCols: _*).as("codes"))
  }

  /** Top-k per query: ADC over the code table → candN short-list →
    * exact cosine re-rank. Output schema matches AnnIvf.ivfTopK. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int,
             m: Int, ksub: Int, candN: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = fitCodebooks(corpus, dims, m, ksub)
    val dsub = dims / m
    val enc = encode(corpus, books, dims)
    // per-query ADC tables: m × ksub exact sub-distances, computed
    // driver-side over the bounded probe set (the q18/q115 class)
    val qrows = queries
      .select(col("vec_id"), col("embedding").cast("array<double>").as("qe"), quantized.as("qv"))
      .collect()
    val qdf = qrows.toSeq.map { r =>
      val qv = r.getSeq[Long](2).toArray
      val tab = (0 until m).map { j =>
        val qs = qv.slice(j * dsub, (j + 1) * dsub)
        books(j).vecs.map(cv => dist2(qs, cv)).toSeq
      }
      (r.getLong(0), r.getSeq[Double](1), tab)
    }.toDF("query_id", "qe", "qtab")
    val adc = expr(
      s"aggregate(sequence(0, ${m - 1}), CAST(0 AS BIGINT), (acc, j) -> " +
        "acc + element_at(element_at(qtab, j + 1), element_at(codes, j + 1) + 1))")
    val wc = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("vec_id").asc)
    val cands = enc.crossJoin(broadcast(qdf)) // sanctioned: |Q| bounded
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adc", adc)
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= candN)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    cands
      .withColumn("sim", AnnLsh.cosine(col("qe"), col("embedding").cast("array<double>")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim_r6"))
  }
}
