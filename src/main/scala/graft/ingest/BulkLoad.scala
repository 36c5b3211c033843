package graft.ingest

import graft.ingest.IngestPipeline.{IngestedRow, Status}
import graft.ingest.PushTableSink.TableSpec
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** HFile-style BULK-LOAD write path for the cell store — the idiomatic
  * heavy-ingest alternative to [[PushTableSink]]'s per-batch puts
  * (reference posture: HbaseClient.kt:31-36 SKIP_WAL bulk writes; the
  * real HBase answer to that posture is writing HFiles directly and
  * atomically handing them to the region servers, which is the shape
  * built here).
  *
  * Plan shape — ONE shuffle, then embarrassingly-parallel file writes:
  *
  *  1. hash-repartition on (tableName, first rowkey byte): the first
  *     byte IS the store's range-shard unit (the HBase region model —
  *     uniform because reference rowkeys open with a CRC32 byte), so
  *     this is a range shard assignment priced as a hash exchange;
  *  2. sortWithinPartitions (tableName, rowkey, version) — Spark's
  *     BinaryType sort is unsigned-lexicographic, the segment order;
  *  3. mapPartitions: each task streams its sorted run and rolls one
  *     [[CellSegment]] per (table, shard) — segments land in a staging
  *     directory invisible to every read face;
  *  4. driver flip-in: after the job commits, each staged segment is
  *     ATOMIC_MOVE'd into `<table>/<shard>/` — per-file atomic, the
  *     same visibility contract as HBase's bulk-load handoff (files
  *     appear whole or not at all; the load as a whole is not one
  *     transaction across regions, and neither is HBase's).
  *
  * Idempotence without an existence check: segment files are named by
  * their content hash and the shuffle+sort is deterministic, so a
  * replayed task, a speculative duplicate, or a whole re-run of the
  * same load produces byte-identical files that REPLACE_EXISTING-flip
  * onto themselves. Duplicate (rowkey, version) cells across the bulk
  * and put paths collapse at READ time — cell identity is
  * (rowkey, version), the F5 invariant — so bulk-after-push and
  * push-after-bulk both converge to the same logical state, which is
  * exactly HBase's duplicate-KeyValue semantics across store files.
  *
  * Scale: no per-cell existence RPCs, no per-cell rename, no W1 batch
  * round-trips — each task does one sequential write per owned shard.
  * Segment size is capped ([[Config.maxSegmentBytes]]) so a hot shard
  * rolls into multiple files instead of one unbounded one; version GC
  * past `maxVersions` across files is compaction's job
  * ([[Compaction]]), as in HBase.
  */
object BulkLoad {

  final case class Config(numPartitions: Int = 0, // 0 → spark.sql.shuffle.partitions
                          maxSegmentBytes: Long = 1L << 30,
                          tableSpec: TableSpec = TableSpec())

  /** One flipped segment, as reported back to the driver (bounded:
    * ≤ tables × 256 shards × segment-roll count rows). */
  final case class SegDesc(table: String, shard: String, file: String,
                           cells: Long, minVersion: Long, maxVersion: Long)

  final case class Report(cells: Long, segments: Seq[SegDesc])

  /** Bulk-load the ok+unfiltered ingest rows — the same row filter and
    * DDL behavior as [[PushTableSink.write]], different write physics. */
  def write(rows: Dataset[IngestedRow], rootDir: String, config: Config = Config()): Report = {
    val spark = rows.sparkSession
    import spark.implicits._
    val cells = rows
      .filter(r => r.status == Status.Ok && r.filterStatus == "DoNotFilter")
      .map(r => (r.tableName, r.rowkey, r.version, r.envelope.getBytes("UTF-8")))
      .toDF("tableName", "rowkey", "version", "body")
    writeCells(cells, rootDir, config)
  }

  /** Bulk-load a generic (tableName, rowkey, version, body) frame.
    * Requires the F5 invariant on input: one body per (tableName,
    * rowkey, version) — a violating duplicate fails the job loudly
    * (adjacent after the sort, so the check is free). */
  def writeCells(cellsDf: DataFrame, rootDir: String, config: Config = Config()): Report = {
    val spark = cellsDf.sparkSession
    import spark.implicits._

    // driver-side DDL over the distinct table names (W3), as the push
    // sink does — bounded by the table count, not the data
    val tables = cellsDf.select(col("tableName")).distinct().as[String].collect().sorted.toSeq
    val store = FileStore(rootDir)
    tables.foreach(store.ensureTable(_, config.tableSpec))

    val staging = Files.createDirectories(
      Paths.get(rootDir, "_bulk_staging", java.util.UUID.randomUUID().toString))
    val stagingStr = staging.toString
    val n = if (config.numPartitions > 0) config.numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val maxSeg = config.maxSegmentBytes

    val descs = cellsDf
      .select(col("tableName"), col("rowkey"), col("version"), col("body"))
      // substring on BinaryType slices bytes: the first-byte range
      // shard as a native column, no UDF
      .withColumn("shard0", substring(col("rowkey"), 1, 1))
      .repartition(n, col("tableName"), col("shard0"))
      .sortWithinPartitions(col("tableName"), col("rowkey"), col("version"))
      .mapPartitions { it =>
        val rows = it.buffered
        val out = Seq.newBuilder[SegDesc]
        while (rows.hasNext) {
          val table = rows.head.getString(0)
          val shard = FileStore.shardOf(rows.head.getAs[Array[Byte]](1))
          def sameRun: Boolean = rows.hasNext && {
            val r = rows.head
            r.getString(0) == table && FileStore.shardOf(r.getAs[Array[Byte]](1)) == shard
          }
          val dir = Paths.get(stagingStr, table.replace(':', '~'), shard)
          while (sameRun) {
            // roll a new segment when the byte cap fills; ≥1 entry each
            var bytes = 0L
            val chunk = new Iterator[(Array[Byte], Long, Array[Byte])] {
              override def hasNext: Boolean = sameRun && (bytes == 0L || bytes < maxSeg)
              override def next(): (Array[Byte], Long, Array[Byte]) = {
                val r = rows.next()
                val k = r.getAs[Array[Byte]](1)
                val b = r.getAs[Array[Byte]](3)
                bytes += 16L + k.length + b.length
                (k, r.getLong(2), b)
              }
            }
            val meta = CellSegment.write(dir, chunk)
            out += SegDesc(table, shard, meta.fileName, meta.entryCount.toLong,
              meta.minVersion, meta.maxVersion)
          }
        }
        out.result().iterator
      }
      .collect()

    // flip-in, driver-side, after every task committed: per-file atomic
    // rename out of staging into the live shard directories
    try {
      descs.foreach { d =>
        val destDir = Paths.get(rootDir, d.table.replace(':', '~'), d.shard)
        Files.createDirectories(destDir)
        Files.move(staging.resolve(d.table.replace(':', '~')).resolve(d.shard).resolve(d.file),
          destDir.resolve(d.file), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(staging.toFile)

    Report(descs.map(_.cells).sum, descs.toSeq)
  }
}
