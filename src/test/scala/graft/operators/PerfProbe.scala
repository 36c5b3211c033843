package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the slow bench queries (run via
  * Test/runMain graft.tools.PerfProbe). Not part of the shipped surface. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // warmup both queries fully
    graft.queries.TrainingData.queries("q51_jaccard_join")(spark, d).count()
    graft.queries.TrainingData.queries("q40_dedup_clusters")(spark, d).count()

    time("q51 total")(graft.queries.TrainingData.queries("q51_jaccard_join")(spark, d).count())
    time("q40 total")(graft.queries.TrainingData.queries("q40_dedup_clusters")(spark, d).count())

    // ---- q51 stage breakdown
    val toks = graft.queries.Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val sh = toks
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 2)).as("i"))
      .select(col("doc_id"),
        concat_ws(" ",
          element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + 1),
          element_at(col("toks"), col("i") + 2)).as("shingle"))
    val raw = time("q51 shingle+distinct+checkpoint") {
      sh.select(col("doc_id").as("id"), col("shingle").as("e")).distinct().localCheckpoint()
    }
    println("PROBE element rows: " + raw.count())
    val dict = raw.select(col("e")).distinct()
      .withColumn("eid", monotonically_increasing_id())
    val e = time("q51 intern+checkpoint") {
      raw.join(dict, "e").select(col("id"), col("eid").as("e")).localCheckpoint()
    }
    val cands0 = SimilarityJoin.candidatePairs(e, 1, 2)
    time("q51 candidates")(println("PROBE candidates: " + cands0.count()))
    val cands = cands0.localCheckpoint()
    cands.count()
    val candDocs = cands.select(col("doc_a").as("id"))
      .union(cands.select(col("doc_b").as("id"))).distinct()
    val sets = time("q51 sets build") {
      val t = e.join(candDocs, Seq("id"), "leftsemi")
        .groupBy(col("id")).agg(collect_list(col("e")).as("es"))
        .localCheckpoint()
      println("PROBE candidate docs: " + t.count()); t
    }
    time("q51 verify join+intersect") {
      val n = cands
        .join(sets.select(col("id").as("doc_a"), col("es").as("es_a")), "doc_a")
        .join(sets.select(col("id").as("doc_b"), col("es").as("es_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("la"), col("lb"),
          size(array_intersect(col("es_a"), col("es_b"))).cast("long").as("shared"))
        .filter(col("shared") * 2 >= (col("la") + col("lb") - col("shared")) * 1)
        .count()
      println("PROBE q51 out pairs: " + n)
    }

    // ---- q40 breakdown: pair generation vs components
    val pairs = time("q40 q24 pairs") {
      val p = graft.queries.TrainingData.queries("q24_dedup_embedding")(spark, d)
        .select(col("vec_a"), col("vec_b")).localCheckpoint()
      println("PROBE q40 pairs: " + p.count()); p
    }
    time("q40 components only") {
      DedupClusters.connectedComponents(pairs, "vec_a", "vec_b").count()
    }
    spark.stop()
  }
}
