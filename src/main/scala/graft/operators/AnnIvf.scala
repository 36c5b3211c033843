package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors: a k-means coarse
  * quantizer partitions the corpus into nlist cells; a query probes its
  * nprobe nearest centroids and runs exact cosine only inside those
  * cells.
  *
  * The complement of the sign-LSH path in [[AnnLsh]]: LSH needs no
  * training and its buckets are data-independent; IVF adapts cells to
  * the data distribution, which wins when the corpus is clustered
  * (here: embeddings carry 10 latent labels). Cost drops from |Q|·|C|
  * to |Q|·(nprobe/nlist)·|C| plus one KMeans fit.
  *
  * Scale shape: training samples the corpus (KMeans on a fraction is
  * standard); assignment is one narrow pass; the search join keys on
  * cell id — nlist is chosen >> shuffle-partition count so cells spread
  * evenly. Seeded, so runs are deterministic.
  */
object AnnIvf {

  /** Assign each vector to its k-means cell.
    * Input: (vec_id, embedding ARRAY<FLOAT>); output adds `cell`.
    *
    * The quantizer FITS ON A SAMPLE (~`samplePerCell` points per
    * centroid, the standard IVF training budget) and then assigns the
    * full corpus in one narrow pass — at 100 TB the fit cost is
    * constant in corpus size while assignment stays a single scan. The
    * sample is seeded and the recall floor in DedupAnnSpec re-verifies
    * cell quality, so sampling is not a silent accuracy leak. */
  def assignCells(vecs: DataFrame, nlist: Int, seed: Long = 11L,
                  samplePerCell: Int = 256): (DataFrame, Array[Vector]) = {
    val withVec = vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("features", array_to_vector(col("emb")))
    val target = nlist.toLong * samplePerCell
    val n = withVec.count()
    val trainSet =
      if (n <= target) withVec
      else withVec.sample(withReplacement = false, target.toDouble / n, seed)
    // random init instead of kmeans||: the parallel init runs several
    // extra distributed passes whose scheduling overhead dominates the
    // fit at these corpus sizes; cell quality is guarded by the
    // planted-near-dup recall floor and sims-agree specs
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setInitMode("random").fit(trainSet)
    (model.transform(withVec).select(col("vec_id"), col("emb"), col("prediction").as("cell")),
      model.clusterCenters)
  }

  /** Top-k neighbors per query via nprobe-cell search. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val (assigned, centers) = assignCells(corpus, nlist)
    // query → its nprobe nearest centroids (tiny driver-side constant:
    // centers are nlist × dims, broadcast as a literal array)
    val centerRows = centers.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    import spark.implicits._
    val centersDf = centerRows.toSeq.toDF("cell", "center")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("qe"))
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("cdist").asc, col("cell").asc)
    val probed = q.crossJoin(broadcast(centersDf))
      .withColumn("cdist",
        aggregate(zip_with(col("qe"), col("center"), (x, y) => (x - y) * (x - y)), lit(0.0), (a, v) => a + v))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("qe"), col("cell"))
    // exact cosine inside probed cells only
    val scored = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", AnnLsh.cosine(col("qe"), col("emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim_r6"))
  }
}
