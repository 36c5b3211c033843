package graft.tools

import graft.ingest.BulkLoad
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the q225 runtime-filtered join claim: a broadcast
  * equi-join against the cell store must cost |dim| point reads — the
  * HBase batched-GET shape — NOT a table scan, and the claim has to
  * hold as the STORE side grows 100× while the dimension stays
  * selective. Prints one JSON line per run:
  *
  *   {"probe":"runtime_filter","sf":…,"store_cells":N,"dim_keys":K,
  *    "files_opened_filtered":F,"files_opened_unfiltered":U,"join_s":…}
  *
  * `files_opened_filtered` is the actual per-run connector I/O counter
  * (the number the q225 gate bounds by K+8); `files_opened_unfiltered`
  * is the same join with runtime filtering effectively disabled by
  * materializing the scan BEFORE the join (the table-scan baseline the
  * feature exists to avoid). Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.RuntimeFilterProbe <sfDir>"
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: RuntimeFilterProbe <sfDir> [digest|prefix]")
    val sfDir = args(0)
    // digest (default): keys spread over all 256 regions — the
    // discriminating fixture; prefix: every key opens 'd' (the q225
    // gate's shape) — one region, one segment
    val keyExpr =
      if (args.length > 1 && args(1) == "prefix") "cast(concat('doc-', doc_id) as binary)"
      else "unhex(md5(concat('doc-', doc_id)))"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-rfprobe").toString
    try {
      // the q225 shape with a DISCRIMINATING keyspace: digest-prefixed
      // rowkeys spread over all 256 first-byte regions (the reference's
      // CRC32-prefix posture), so "runtime filter applied" vs "cheap
      // single-segment scan anyway" produce different open counts —
      // unfiltered streams every region's segment, filtered seeks only
      // the probed keys' entries in the probed regions
      BulkLoad.writeCells(
        graft.queries.Tables.documents(spark, sfDir).filter(col("doc_id") % 12 === 0)
          .select(lit("probe").as("tableName"),
            expr(keyExpr).as("rowkey"),
            col("doc_id").cast("long").as("version"),
            expr("cast(md5(concat(cast(doc_id as string), 'J')) as binary)").as("body")),
        root)
      val cells = spark.read.format("graft-cells")
        .option("root", root).option("table", "probe").load()
      val storeCells = cells.count()
      val dim = graft.queries.Tables.documents(spark, sfDir).filter(col("doc_id") % 120 === 0)
        .select(expr(keyExpr).as("k"))
      val dimKeys = dim.count()
      def joined = cells.join(broadcast(dim), col("rowkey") === col("k"))
      val planStr = joined.queryExecution.executedPlan.toString
      require(planStr.contains("dynamicpruning"),
        s"probe join must carry the runtime filter:\n$planStr")
      graft.sources.CellsSource.filesOpened.set(0)
      graft.sources.CellsSource.runtimeFilteredKeys.set(0)
      val t0 = System.nanoTime()
      val matched = joined.count()
      val joinS = (System.nanoTime() - t0) / 1e9
      val opened = graft.sources.CellsSource.filesOpened.get()
      val narrowed = graft.sources.CellsSource.runtimeFilteredKeys.get()
      require(matched == dimKeys, s"join must match every dim key: $matched vs $dimKeys")
      // baseline: same join, runtime filter defeated by a localCheckpoint
      // barrier between scan and join — the scan reads the whole table
      graft.sources.CellsSource.filesOpened.set(0)
      val base = cells.localCheckpoint().join(broadcast(dim), col("rowkey") === col("k")).count()
      val openedBase = graft.sources.CellsSource.filesOpened.get()
      require(base == matched)
      println(s"""{"probe":"runtime_filter","sf":"$sfDir","store_cells":$storeCells,""" +
        s""""dim_keys":$dimKeys,"runtime_narrowed_keys":$narrowed,"files_opened_filtered":$opened,""" +
        s""""files_opened_unfiltered":$openedBase,"join_s":${"%.3f".format(joinS)}}""")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
