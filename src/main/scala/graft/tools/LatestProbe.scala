package graft.tools

import graft.ingest.BulkLoad
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the q232 `$latest` claim: the serving face must
  * cost its WINNERS, not the table's history — against the best
  * DataFrame-side alternative, the exchange-free per-region max_by
  * aggregate (which still has to READ every version to fold it).
  * Fixture: G generations bulk-loaded separately, so each shard holds
  * G segments and exactly one (the newest) contains winners — the
  * between-majors backlog shape where the fold's advantage is real I/O,
  * not bookkeeping. Prints one JSON line:
  *
  *   {"probe":"latest","sf":…,"keys":K,"generations":G,
  *    "latest_opens":A,"aggregate_opens":B,"latest_s":…,"aggregate_s":…}
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.LatestProbe <sfDir> [G]"
  */
object LatestProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: LatestProbe <sfDir> [generations]")
    val sfDir = args(0)
    val gens = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val root = Files.createTempDirectory("graft-latestprobe").toString
    val cat = "glp_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(s"spark.sql.catalog.$cat", classOf[graft.sources.CellsCatalog].getName)
      .config(s"spark.sql.catalog.$cat.root", root)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // one bulk load per generation: G segments per shard, winners
      // confined to the newest — digest-spread keys (every region)
      (1 to gens).foreach { g =>
        BulkLoad.writeCells(
          graft.queries.Tables.documents(spark, sfDir).filter(col("doc_id") % 2 === 0)
            .select(lit("probe").as("tableName"),
              expr("unhex(md5(concat('doc-', doc_id)))").as("rowkey"),
              expr(s"${g}000000000 + doc_id").as("version"), // bigint literal: g·1e9
              expr(s"cast(md5(concat(cast(doc_id as string), 'G', '$g')) as binary)").as("body")),
          root)
      }
      val keys = graft.queries.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 2 === 0).count()
      def timed(f: => Long): (Long, Double, Long) = {
        graft.sources.CellsSource.filesOpened.set(0)
        val t0 = System.nanoTime()
        val n = f
        (n, (System.nanoTime() - t0) / 1e9, graft.sources.CellsSource.filesOpened.get())
      }
      // the measured op READS BODIES (the serving read, not a count —
      // a count over $latest is index-only and would flatter the fold)
      def serve(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(count(col("body")), sum(length(col("body")))).collect()(0).getLong(0)
      val agg = spark.table(s"$cat.probe").groupBy(col("rowkey"))
        .agg(max_by(struct(col("version"), col("body")), col("version")).as("m"))
        .select(col("rowkey"), col("m.version").as("version"), col("m.body").as("body"))
      // warm both plans once (codegen/JIT), then measure
      serve(spark.table(s"$cat.`probe$$latest`")); serve(agg)
      val (nLatest, tLatest, oLatest) = timed(serve(spark.table(s"$cat.`probe$$latest`")))
      val (nAgg, tAgg, oAgg) = timed(serve(agg))
      require(nLatest == keys && nAgg == keys, s"both faces serve one row per key: $nLatest/$nAgg/$keys")
      // equality of the two faces (content, not just counts)
      val latestDf = spark.table(s"$cat.`probe$$latest`")
      require(latestDf.exceptAll(agg).isEmpty && agg.exceptAll(latestDf).isEmpty,
        "the $latest face must equal the max_by fold")
      println(s"""{"probe":"latest","sf":"$sfDir","keys":$keys,"generations":$gens,""" +
        s""""latest_opens":$oLatest,"aggregate_opens":$oAgg,""" +
        s""""latest_s":${"%.3f".format(tLatest)},"aggregate_s":${"%.3f".format(tAgg)}}""")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
