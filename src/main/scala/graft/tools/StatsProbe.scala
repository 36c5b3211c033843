package graft.tools

import graft.ingest.{BulkLoad, CellSegment, FileStore}
import graft.sources.{CellsKeyPred, CellsScan, CellsSource}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for PLANNING-TIME statistics cost: with GSE3 trailers,
  * `estimateStatistics` on a compacted store must cost O(segments)
  * 52-byte trailer reads — NOT an index walk per segment (O(cells)
  * driver I/O and memory, the r13 shape the advisor flagged). The
  * probe builds a store from the documents table, measures the
  * trailer-only tier (segment index loads + wall time), then forces
  * the masked fallback with one marker per shard and measures again.
  * Prints one JSON line:
  *
  *   {"probe":"stats_planning","sf":…,"store_cells":N,"segments":S,
  *    "index_reads_clean":0,"stats_s_clean":…,
  *    "index_reads_masked":~S,"stats_s_masked":…,
  *    "rows_clean":N,"rows_masked":…}
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StatsProbe <sfDir>"
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: StatsProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val root = Files.createTempDirectory("graft-statsprobe").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // digest-spread keys, 3 versions each — a segment per region
      BulkLoad.writeCells(
        graft.queries.Tables.documents(spark, sfDir).filter(col("doc_id") % 4 === 0)
          .select(col("doc_id"), explode(array(lit(1), lit(2), lit(3))).as("g"))
          .select(lit("probe").as("tableName"),
            expr("unhex(md5(concat('doc-', doc_id)))").as("rowkey"),
            expr("doc_id * 4 + g").as("version"),
            expr("cast(md5(concat(cast(doc_id as string), 'S')) as binary)").as("body")),
        root)
      val dir = java.nio.file.Paths.get(root, "probe")
      def segments: Long = {
        val s = java.nio.file.Files.walk(dir)
        try s.filter(p => CellSegment.isSegment(p.getFileName.toString)).count()
        finally s.close()
      }
      val segs = segments
      def measure(): (Long, Double, Long) = {
        val ir0 = CellSegment.indexReads.get()
        val t0 = System.nanoTime()
        val st = CellsScan(root, "probe", Long.MinValue, Long.MaxValue,
          CellsKeyPred.All, CellsSource.Schema).estimateStatistics()
        val rows = st.numRows().getAsLong
        ((CellSegment.indexReads.get() - ir0), (System.nanoTime() - t0) / 1e9, rows)
      }
      val (irClean, sClean, rowsClean) = measure()
      // one marker in one shard: ONLY that shard may fall back to its
      // index walk — the rest stay trailer-only
      val anyKey = graft.queries.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 4 === 0).select(expr("unhex(md5(concat('doc-', doc_id)))"))
        .limit(1).collect()(0).getAs[Array[Byte]](0)
      FileStore(root).deleteCellsExact("probe", Seq((anyKey, 5L)))
      val (irMasked, sMasked, rowsMasked) = measure()
      println(s"""{"probe":"stats_planning","sf":"$sfDir","store_cells":${3 * rowsClean / 3},""" +
        s""""segments":$segs,"index_reads_clean":$irClean,""" +
        s""""stats_s_clean":${"%.4f".format(sClean)},""" +
        s""""index_reads_masked":$irMasked,"stats_s_masked":${"%.4f".format(sMasked)},""" +
        s""""rows_clean":$rowsClean,"rows_masked":$rowsMasked}""")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
