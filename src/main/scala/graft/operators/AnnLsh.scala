package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbors over an embedding column.
  *
  * Two paths:
  *  - [[cosineTopK]] — exact brute force: query×corpus join with a
  *    codegen'd higher-order-function cosine. O(|Q|·|C|): the baseline
  *    and the verifier, fine when |Q| is small or the corpus is
  *    broadcastable.
  *  - [[lshTopK]] — random-hyperplane (sign) LSH, multi-table: L=4
  *    independent tables of 8 Rademacher hyperplanes each → an 8-bit
  *    bucket per (vector, table) → candidates share a bucket in ANY
  *    table (standard OR-amplification for recall) → exact cosine only
  *    on candidates. The bucket join is the only shuffle and its key
  *    (tableIdx, bucket) spreads uniformly, so this is the 100 TB
  *    path: cost drops from |Q|·|C| to Σ_bucket |Q_b|·|C_b|. Bucket
  *    width vs corpus size trades recall against candidate count —
  *    with 2^8 buckets × 4 tables a 10^9-vector corpus would move to
  *    wider buckets (more planes), which is a constant here.
  *
  * Hyperplanes are seed-derived constants baked into the plan as array
  * literals — deterministic across runs and executors.
  */
object AnnLsh {

  val NumPlanes = 8
  val NumTables = 4

  /** Native codegen'd left-to-right dot product (ArrayDotProduct) —
    * bit-identical to the `aggregate(zip_with(...))` formulation and to
    * DuckDB's `list_dot_product`, ~10× faster (tight primitive loop, no
    * per-element lambda dispatch, no intermediate array). */
  def dot(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftSqlGlue.column(
      graft.functions.ArrayDotProduct(
        org.apache.spark.sql.GraftSqlGlue.expression(x),
        org.apache.spark.sql.GraftSqlGlue.expression(y)))

  /** cosine(a, b) with explicit left-to-right summation — the exact
    * formula the DuckDB oracle mirrors (dot / (sqrt(na) * sqrt(nb))). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors for each query vector (excluding itself). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("ce"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qe"), col("ce")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim_r6"))
  }

  /** Seeded ±1 hyperplanes for one table, fixed at plan build. */
  def planes(dims: Int, tableIdx: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed + tableIdx * 7919L)
    Array.fill(NumPlanes)(Array.fill(dims)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** 8-bit sign-LSH bucket for an embedding column under one table's
    * hyperplanes. */
  def bucket(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits: Seq[Column] = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit(_)): _*).cast("array<double>")
      val dotP = dot(emb, planeLit)
      when(dotP >= 0, lit(1 << i)).otherwise(lit(0))
    }.toSeq
    bits.reduce(_ + _)
  }

  /** (vec, tableIdx, bucket) rows — one per table, computed in a
    * SINGLE scan: all NumTables buckets project as columns (the plane
    * dots are native codegen), then a stack/posexplode fans them out.
    * The previous 4-way unionAll read and re-projected the input four
    * times. */
  private def bucketed(vecs: DataFrame, idAlias: String, embAlias: String, dims: Int): DataFrame = {
    val base = vecs.select(col("vec_id").as(idAlias), asDouble(col("embedding")).as(embAlias))
    val withBuckets = (0 until NumTables).foldLeft(base) { (df, t) =>
      df.withColumn(s"b$t", bucket(col(embAlias), planes(dims, t)))
    }
    withBuckets
      .select(col(idAlias), col(embAlias),
        posexplode(array((0 until NumTables).map(t => col(s"b$t")): _*)).as(Seq("table_idx", "bucket")))
  }

  /** Approximate top-k: candidates share a bucket in any table. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int): DataFrame = {
    val q = bucketed(queries, "query_id", "qe", dims)
    val c = bucketed(corpus, "neighbor_id", "ce", dims)
    val scored = q.join(c, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qe"), col("ce"))
      .distinct() // a pair may collide in several tables
      .withColumn("sim", cosine(col("qe"), col("ce")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim_r6"))
  }
}
