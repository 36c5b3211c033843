package graft.tools

import graft.ingest.BulkLoad
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the q234 MERGE I/O shape: what does the TARGET scan
  * of a row-level MERGE actually cost when the source is small? The
  * runtime-filter machinery that turns a q225 broadcast join into
  * batched GETs requires a reusable broadcast of the source keys — a
  * delta MERGE plans target RIGHT OUTER source, whose preserved side
  * cannot be the broadcast build side, so the honest expectation is a
  * region-parallel TABLE SCAN of the target regardless of source size.
  * This probe measures instead of assuming. Prints one JSON line:
  *
  *   {"probe":"merge_scan","sf":…,"store_cells":N,"source_keys":K,
  *    "files_opened_merge":F,"files_opened_full_scan":U,"merge_s":…}
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.MergeProbe <sfDir>"
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: MergeProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val root = Files.createTempDirectory("graft-mergeprobe").toString
    val cat = "gmp_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
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
      // digest-spread keys over all 256 regions — the discriminating
      // keyspace (a prefix keyspace would make any result look cheap)
      BulkLoad.writeCells(
        graft.queries.Tables.documents(spark, sfDir).filter(col("doc_id") % 12 === 0)
          .select(lit("probe").as("tableName"),
            expr("unhex(md5(concat('doc-', doc_id)))").as("rowkey"),
            col("doc_id").cast("long").as("version"),
            expr("cast(md5(concat(cast(doc_id as string), 'M')) as binary)").as("body")),
        root)
      val cells = spark.table(s"$cat.probe")
      val storeCells = cells.count()
      val srcKeys = graft.queries.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 120 === 0).count()
      def mergeOnce(tag: String): (Long, Double) = {
        graft.sources.CellsSource.filesOpened.set(0)
        val t0 = System.nanoTime()
        spark.sql(
          s"""MERGE INTO $cat.probe t
              USING (SELECT unhex(md5(concat('doc-', doc_id))) AS rowkey,
                            cast(doc_id as bigint) AS version,
                            cast(md5(concat(cast(doc_id as string), '$tag')) as binary) AS body
                     FROM parquet.`$sfDir/documents.parquet`
                     WHERE doc_id % 120 = 0) s
              ON t.rowkey = s.rowkey
              WHEN MATCHED THEN UPDATE SET body = s.body
              WHEN NOT MATCHED THEN
                INSERT (rowkey, version, body) VALUES (s.rowkey, s.version, s.body)""")
        (graft.sources.CellsSource.filesOpened.get(), (System.nanoTime() - t0) / 1e9)
      }
      val (openedMerge, mergeS) = mergeOnce("M2")
      // an UPDATE-ONLY merge has no NOT MATCHED arm: the rewrite can
      // plan an INNER join, whose broadcast carries the q225 runtime
      // filter — measure whether the target scan narrows to the
      // source's keys there
      graft.sources.CellsSource.filesOpened.set(0)
      val t1 = System.nanoTime()
      spark.sql(
        s"""MERGE INTO $cat.probe t
            USING (SELECT unhex(md5(concat('doc-', doc_id))) AS rowkey,
                          cast(md5(concat(cast(doc_id as string), 'M3')) as binary) AS body
                   FROM parquet.`$sfDir/documents.parquet`
                   WHERE doc_id % 120 = 0) s
            ON t.rowkey = s.rowkey
            WHEN MATCHED THEN UPDATE SET body = s.body""")
      val updS = (System.nanoTime() - t1) / 1e9
      val openedUpd = graft.sources.CellsSource.filesOpened.get()
      graft.sources.CellsSource.filesOpened.set(0)
      cells.localCheckpoint().count() // the full-scan baseline
      val openedFull = graft.sources.CellsSource.filesOpened.get()
      println(s"""{"probe":"merge_scan","sf":"$sfDir","store_cells":$storeCells,""" +
        s""""source_keys":$srcKeys,"files_opened_merge":$openedMerge,""" +
        s""""files_opened_update_only":$openedUpd,"update_only_s":${"%.3f".format(updS)},""" +
        s""""files_opened_full_scan":$openedFull,"merge_s":${"%.3f".format(mergeS)}}""")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
