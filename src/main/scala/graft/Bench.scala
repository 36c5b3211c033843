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
    // Steady-state measurement: run EVERY query once untimed first, so
    // each unique plan's one-time codegen compile + JVM JIT cost (2-6 s
    // per plan, measured) lands in the warmup, not on the timed run.
    // That is the number that holds at scale — on a 100 TB job the
    // per-plan compile amortizes to nothing; a cold-JVM measurement
    // only ranks queries by how much bytecode they generate.
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    sorted.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // (elapsed sec, error message or null) per query: a crashing query
    // must be distinguishable from a fast one in the bench JSON.
    val results: Map[String, (Double, String)] = sorted.map { case (name, fn) =>
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
