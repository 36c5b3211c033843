package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Phase-level stopwatch for the q205 incremental-backup gate
  * (optimization guide §1: attribute the driver residue before
  * touching anything). Replicates the gate's exact step sequence and
  * prints per-phase wall times; run twice so the second pass is
  * JIT/codegen-warm like the bench's timed passes.
  *
  * Usage: runMain graft.tools.BackupProbe [sfDir] [passes]
  */
object BackupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    for (p <- 1 to passes) {
      val srcRoot = Files.createTempDirectory("graft-bp-src").toString
      val bakDir = Files.createTempDirectory("graft-bp-bak").toString
      val dstRoot = Files.createTempDirectory("graft-bp-dst").toString
      val t0 = System.nanoTime()
      var last = t0
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"[bp] pass $p $name%-28s ${(now - last) / 1e6}%8.1f ms")
        last = now
      }
      try {
        def seed(v: Int): Unit = graft.queries.Tables.documents(s, sfDir)
          .filter(col("doc_id") % 17 === 0)
          .select(expr("cast(concat('doc-', doc_id) as binary)").as("rowkey"),
            expr(s"$v * 1000000000 + doc_id").as("version"),
            expr(s"cast(md5(concat(cast(doc_id as string), '+', '$v')) as binary)").as("body"))
          .write.format("graft-cells").mode("append")
          .option("root", srcRoot).option("table", "q205").save()
        def readTable(root: String) = s.read.format("graft-cells")
          .option("root", root).option("table", "q205").load()
        seed(1); lap("seed1")
        val m1 = graft.ingest.Backup.full(s, srcRoot, "q205", bakDir); lap("backup.full")
        val batch1Max = readTable(srcRoot).agg(max(col("version"))).collect()(0).getLong(0)
        require(m1.watermark == batch1Max); lap("gate: batch1Max agg")
        graft.queries.Tables.documents(s, sfDir).filter(col("doc_id") % 34 === 0)
          .select(expr("cast(concat('doc-', doc_id) as binary)").as("rowkey"),
            expr("1000000000 + doc_id").as("version"),
            lit(Array.emptyByteArray).as("body"))
          .write.format("graft-cells").mode("append")
          .option("root", srcRoot).option("table", "q205")
          .option("tombstone", "true").save()
        lap("tombstone write")
        seed(2); lap("seed2")
        val m2 = graft.ingest.Backup.incremental(s, srcRoot, "q205", bakDir)
        lap("backup.incremental")
        val incr = s.read.parquet(s"$bakDir/${m2.increments.last}")
        val batch2 = readTable(srcRoot).filter(col("version") > m1.watermark)
        require(incr.count() == batch2.count() && m2.watermark > m1.watermark)
        lap("gate: incr counts")
        val markers = s.read.parquet(s"$bakDir/${m2.increments.last}-tombstones")
        val expectedDeletes = graft.queries.Tables.documents(s, sfDir)
          .filter(col("doc_id") % 34 === 0).count()
        require(markers.count() == expectedDeletes && expectedDeletes > 0)
        lap("gate: marker counts")
        graft.ingest.Backup.restore(s, bakDir, dstRoot); lap("backup.restore")
        val src = readTable(srcRoot)
        val dst = readTable(dstRoot)
        require(src.exceptAll(dst).count() == 0 && dst.exceptAll(src).count() == 0)
        lap("gate: exceptAll x2")
        dst.select(col("rowkey").cast("string").as("key_str"), col("version"),
            col("body").cast("string").as("body_md5"))
          .localCheckpoint()
        lap("localCheckpoint")
        println(f"[bp] pass $p TOTAL ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(srcRoot))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bakDir))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dstRoot))
      }
    }
    s.stop()
  }
}
