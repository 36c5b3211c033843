package graft.tools

import graft.ingest.{CellSegment, FileStore, PushTableSink}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** FLUSH-POLICY PROBE — counter-pins the r15 write-path maintenance
  * claim at scale: under sustained put load, the automatic shard
  * flush + segment tier keep every shard's file count O(threshold)
  * and the masked read's cost FLAT across waves, while the
  * threshold-0 CONTROL table (the r14 world) accumulates a put file
  * per cell and its read cost grows with the backlog — the q221
  * failure mode (14.7× super-linear on an unflushed backlog), now
  * closed at the source rather than by a remembered operator CALL.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.FlushProbe <sfDir> [waves]"
  * Prints one JSON line:
  *   {"probe":"flush","waves":N,"policy":{"maxFiles":…,"reads":[…],"flushes":…,"minors":…},
  *    "control":{"maxFiles":…,"reads":[…]}}
  */
object FlushProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: FlushProbe <sfDir> [waves]")
    val sfDir = args(0)
    val waves = if (args.length > 1) args(1).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft-flush-probe").toString
    try {
      val store = FileStore(root)
      store.ensureTable("policy", PushTableSink.TableSpec()) // default threshold 10
      store.ensureTable("control", PushTableSink.TableSpec(compactionThreshold = 0))
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").cast("long").as("doc_id")).cache()
      docs.count()

      def maxFilesPerShard(table: String): (Int, Int) = {
        val dir = Paths.get(root, table)
        if (!Files.isDirectory(dir)) return (0, 0)
        val shards = Files.list(dir)
        try {
          var maxPuts = 0
          var maxSegs = 0
          shards.iterator().asScala.filter(Files.isDirectory(_)).foreach { sh =>
            val l = Files.list(sh)
            try {
              var p = 0; var g = 0
              l.iterator().asScala.map(_.getFileName.toString)
                .filterNot(_.endsWith(".tmp")).foreach { n =>
                  if (CellSegment.isSegment(n)) g += 1
                  else {
                    val dot = n.lastIndexOf('.')
                    if (dot > 0 && n.drop(dot + 1).toLongOption.isDefined) p += 1
                  }
                }
              maxPuts = math.max(maxPuts, p); maxSegs = math.max(maxSegs, g)
            } finally l.close()
          }
          (maxPuts, maxSegs)
        } finally shards.close()
      }

      def wave(table: String, w: Int): Unit =
        docs.select(
          expr("cast(concat('doc-', doc_id) as binary)").as("rowkey"),
          (lit(w.toLong) * 1000000000L + col("doc_id")).as("version"),
          expr(s"cast(md5(concat(cast(doc_id as string), 'w$w')) as binary)").as("body"))
          .write.format("graft-cells").mode("append")
          .option("root", root).option("table", table).save()

      def timedRead(table: String): Double = {
        // force BODY materialization — a bare count() prunes to the
        // filename-only path on both tables and hides the backlog's
        // open-per-cell cost, which is exactly what the probe measures
        val t0 = System.nanoTime()
        spark.read.format("graft-cells").option("root", root).option("table", table)
          .load().select(sum(length(col("body")))).collect()
        (System.nanoTime() - t0) / 1e9
      }

      val f0 = FileStore.autoFlushes.get()
      val m0 = FileStore.autoMinors.get()
      val polReads = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ctlReads = scala.collection.mutable.ArrayBuffer.empty[Double]
      var polMax = (0, 0)
      var ctlMax = (0, 0)
      (1 to waves).foreach { w =>
        wave("policy", w); wave("control", w)
        val pm = maxFilesPerShard("policy"); val cm = maxFilesPerShard("control")
        polMax = (math.max(polMax._1, pm._1), math.max(polMax._2, pm._2))
        ctlMax = (math.max(ctlMax._1, cm._1), math.max(ctlMax._2, cm._2))
        polReads += timedRead("policy")
        ctlReads += timedRead("control")
      }
      def arr(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
      println(
        s"""{"probe":"flush","waves":$waves,"sf":"$sfDir",""" +
          s""""policy":{"maxPutFiles":${polMax._1},"maxSegments":${polMax._2},""" +
          s""""reads":${arr(polReads.toSeq)},"flushes":${FileStore.autoFlushes.get() - f0},""" +
          s""""minors":${FileStore.autoMinors.get() - m0}},""" +
          s""""control":{"maxPutFiles":${ctlMax._1},"maxSegments":${ctlMax._2},""" +
          s""""reads":${arr(ctlReads.toSeq)}}}""")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      spark.stop()
    }
  }
}
