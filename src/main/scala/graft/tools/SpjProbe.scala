package graft.tools

import graft.ingest.BulkLoad
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the q228 storage-partitioned join: the SAME rowkey
  * equi-join between two same-layout catalog tables, once with SPJ on
  * (zero exchange — per-region merge joins where the data lives) and
  * once with v2 bucketing disabled (the ordinary shuffle join both
  * sides pay otherwise). Prints one JSON line:
  *
  *   {"probe":"spj","sf":…,"rows_a":…,"rows_b":…,"matched":…,
  *    "spj_s":…,"shuffle_s":…,"spj_exchange":false,"shuffle_exchange":true}
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SpjProbe <sfDir>"
  */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: SpjProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val root = Files.createTempDirectory("graft-spjprobe").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.catalog.gspj", classOf[graft.sources.CellsCatalog].getName)
      .config("spark.sql.catalog.gspj.root", root)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val points = (1 to 9).map(i => s"doc-$i".getBytes("UTF-8"))
      def seed(table: String, pred: Int, tag: String): Unit =
        BulkLoad.writeCells(
          graft.queries.Tables.documents(spark, sfDir).filter(col("doc_id") % pred === 0)
            .select(lit(table).as("tableName"),
              expr("cast(concat('doc-', doc_id) as binary)").as("rowkey"),
              col("doc_id").cast("long").as("version"),
              expr(s"cast(md5(concat(cast(doc_id as string), '$tag')) as binary)").as("body")),
          root, BulkLoad.Config(splitPoints = points))
      seed("spja", 2, "PA")
      seed("spjb", 4, "PB")
      def joined = spark.table("gspj.spja").as("a")
        .join(spark.table("gspj.spjb").as("b"), col("a.rowkey") === col("b.rowkey"))
        .select(col("a.rowkey"), col("a.body"), col("b.body"))
      def time2(run: () => Long): (Double, Long) = {
        run() // warmup (codegen + cache)
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = run(); ((System.nanoTime() - t0) / 1e9, n)
        }
        (samples.map(_._1).min, samples.head._2)
      }
      val rowsA = spark.table("gspj.spja").count()
      val rowsB = spark.table("gspj.spjb").count()
      val spjPlan = joined.queryExecution.executedPlan.toString
      val spjHasExchange = spjPlan.contains("Exchange")
      val (spjS, matched) = time2(() => joined.count())
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val shufPlan = joined.queryExecution.executedPlan.toString
      val shufHasExchange = shufPlan.contains("Exchange")
      val (shufS, matched2) = time2(() => joined.count())
      require(matched == matched2, s"A/B must agree: $matched vs $matched2")
      println(s"""{"probe":"spj","sf":"$sfDir","rows_a":$rowsA,"rows_b":$rowsB,""" +
        s""""matched":$matched,"spj_s":${"%.3f".format(spjS)},"shuffle_s":${"%.3f".format(shufS)},""" +
        s""""spj_exchange":$spjHasExchange,"shuffle_exchange":$shufHasExchange}""")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      spark.stop()
    }
  }
}
