package graft.tools

import graft.ingest.BulkLoad
import graft.sources.{CellsSource, MergeSourcePruning}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the q234 MERGE I/O shape: what does the TARGET scan
  * of a row-level MERGE actually cost when the source is small?
  *
  * Two regimes, both measured (never assumed):
  *
  *  - WITHOUT the source-key pre-pass, the delta MERGE plans target
  *    RIGHT OUTER source, whose preserved side cannot be a broadcast
  *    build side — no q225 runtime filter ever fires and the target
  *    pays a region-parallel table scan regardless of source size
  *    (this probe's r13 finding).
  *  - WITH [[MergeSourcePruning]] installed, a bounded pre-pass
  *    collects the source's distinct rowkeys and narrows the target
  *    scan through the q225 InputPartition key-set predicate: opens
  *    should track |source keys| (two-sided check), and pushing the
  *    cap below |source| must DECLINE back to the full scan.
  *
  * Prints one JSON line:
  *
  *   {"probe":"merge_scan","sf":…,"store_cells":N,"source_keys":K,
  *    "files_opened_merge":F,"files_opened_update_only":F2,
  *    "files_opened_merge_declined":F3,"files_opened_full_scan":U,
  *    "narrowed_keys":…,"merge_s":…,"update_only_s":…}
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
    MergeSourcePruning.install(spark)
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
      def mergeOnce(tag: String): (Long, Long, Double) = {
        CellsSource.filesOpened.set(0)
        CellsSource.runtimeFilteredKeys.set(0)
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
        (CellsSource.filesOpened.get(), CellsSource.runtimeFilteredKeys.get(),
          (System.nanoTime() - t0) / 1e9)
      }
      val (openedMerge, narrowedKeys, mergeS) = mergeOnce("M2")
      // update-only merge (no NOT MATCHED arm → inner-join rewrite):
      // the pre-pass must narrow this shape too
      CellsSource.filesOpened.set(0)
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
      val openedUpd = CellsSource.filesOpened.get()
      // decline path: cap below |source| → the warn-and-full-scan plan
      spark.conf.set(MergeSourcePruning.MaxKeysConf, "1")
      CellsSource.filesOpened.set(0)
      spark.sql(
        s"""MERGE INTO $cat.probe t
            USING (SELECT unhex(md5(concat('doc-', doc_id))) AS rowkey,
                          cast(md5(concat(cast(doc_id as string), 'M4')) as binary) AS body
                   FROM parquet.`$sfDir/documents.parquet`
                   WHERE doc_id % 120 = 0) s
            ON t.rowkey = s.rowkey
            WHEN MATCHED THEN UPDATE SET body = s.body""")
      val openedDeclined = CellsSource.filesOpened.get()
      spark.conf.unset(MergeSourcePruning.MaxKeysConf)
      CellsSource.filesOpened.set(0)
      cells.localCheckpoint().count() // the full-scan baseline
      val openedFull = CellsSource.filesOpened.get()
      println(s"""{"probe":"merge_scan","sf":"$sfDir","store_cells":$storeCells,""" +
        s""""source_keys":$srcKeys,"files_opened_merge":$openedMerge,""" +
        s""""narrowed_keys":$narrowedKeys,""" +
        s""""files_opened_update_only":$openedUpd,"update_only_s":${"%.3f".format(updS)},""" +
        s""""files_opened_merge_declined":$openedDeclined,""" +
        s""""files_opened_full_scan":$openedFull,"merge_s":${"%.3f".format(mergeS)}}""")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
