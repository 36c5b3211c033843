package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming micro-batch cost attribution (guide §1): replays the
  * q161-shaped windowed aggregation over the staged 3-file feed and
  * prints each micro-batch's durationMs breakdown (addBatch, getBatch,
  * walCommit, commitOffsets) plus stateOperators commit times — the
  * numbers the Spark UI would show for a streaming query. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // run the real q161 once so its staged source exists
    try graft.SparkEntry.queries("q161_stream_late_drop")(spark, sfDir).count()
    catch { case e: Throwable => throw e }
    // ONE shared derivation with the query (ADVICE r17 — the probe
    // used to duplicate the naming scheme and would break silently)
    val src = graft.queries.Advanced.q161StagedDir(sfDir)
    require(src.exists(), s"staged dir missing: $src")
    (1 to 2).foreach { pass =>
      val ck = java.nio.file.Files.createTempDirectory("graft-sprobe-ck")
      val sink = s"sprobe_$pass"
      val schema = spark.read.parquet(src.getPath).schema
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.getPath)
        .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
        .filter(col("event_type") =!= "__nudge")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append")
        .format("memory").queryName(sink)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println(f"== pass $pass wall ${(System.nanoTime() - t0) / 1e6}%.0f ms, " +
        s"parts=$parts cpus=$cpus")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        val so = p.stateOperators.map(s =>
          s"commit=${s.customMetrics.getOrDefault("stateOnCurrentVersionSizeBytes", -1L)}" +
            s" rowsUpd=${s.numRowsUpdated}").mkString(";")
        println(s"  batch=${p.batchId} in=${p.numInputRows} durationMs=$d state[$so]")
      }
      spark.catalog.dropTempView(sink)
      org.apache.commons.io.FileUtils.deleteQuietly(ck.toFile)
    }
    spark.stop()
  }
}
