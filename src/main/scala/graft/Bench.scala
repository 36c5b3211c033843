package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scan + join + agg + window codepaths once so
    // first-run JIT/codegen cost doesn't land on an arbitrary query
    // (query map iteration order is hash-order)
    Seq("q01_pricing_summary", "q05_multi_join", "q08_window").foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // (elapsed sec, error message or null) per query: a crashing query
    // must be distinguishable from a fast one in the bench JSON.
    val results: Map[String, (Double, String)] = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); null }
        catch { case e: Throwable => Option(e.getMessage).getOrElse(e.getClass.getName).take(120) }
      name -> (((System.nanoTime() - t0) / 1e9, err))
    }.toMap
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString } + "\""
    val qs = results.map { case (k, (v, _)) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, e)) if e != null => jstr(k) + ":" + jstr(e) }.mkString("{", ",", "}")
    val nFailed = results.count(_._2._2 != null)
    val total = results.values.map(_._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFailed,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (nFailed > 0) sys.exit(3)
  }
}
