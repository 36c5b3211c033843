package graft.ingest

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** MAJOR COMPACTION for the cell store — the maintenance operator that
  * completes the HBase store-file lifecycle: flushed per-cell puts and
  * bulk-loaded [[CellSegment]]s accumulate per shard; compaction
  * rewrites the whole set into fresh sorted segments, applying the
  * retention the write paths only promise (the table DDL's
  * `maxVersions`, plus an optional TTL cutoff with the q140
  * minVersions=1 semantics: expired versions go, but every key keeps
  * its latest cell), then deletes the superseded files.
  *
  * Plan shape: one shard-parallel connector scan, one per-key
  * retention ranking (hash exchange on rowkey — groups are
  * per-key version lists, never corpus-sized), and [[BulkLoad]]'s
  * write physics for the rewrite (range shuffle → sorted segments →
  * atomic flip-in). File deletion fans out over the 256 shard
  * directories.
  *
  * Visibility contract (HBase's): the new segments flip in BEFORE old
  * files are removed, and every read face dedupes on (key, version),
  * so a concurrent reader sees each retained cell exactly once at any
  * point; versions being GC'd remain visible until their old files
  * are gone (compaction is eventually-applied retention, exactly as
  * in HBase). Idempotent: re-compacting a compacted table regenerates
  * the identical content-hash segment names, flips them onto
  * themselves, and deletes nothing. Like its HBase analog, compaction
  * is a single-maintainer operation per table: a put racing the
  * delete phase can be swept (its cell is not in the rewrite), so
  * writers pause per table — not per store — during compaction.
  *
  * Reference contract: maxVersions/minVersions DDL at
  * HbaseClient.kt:83-92; the reference relies on HBase itself to GC
  * versions at compaction time — this operator IS that compactor for
  * the sandbox store.
  */
object Compaction {

  final case class Report(keptCells: Long, removedFiles: Long, segments: Seq[BulkLoad.SegDesc])

  def major(spark: SparkSession, root: String, table: String,
            ttlCutoff: Option[Long] = None,
            config: BulkLoad.Config = BulkLoad.Config()): Report = {
    val store = FileStore(root)
    val maxVersions = store.readSpecJson(table).flatMap { json =>
      """"maxVersions":(-?\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
    }.getOrElse(Int.MaxValue)

    val cells = spark.read.format("graft-cells")
      .option("root", root).option("table", table).load()

    // retention: newest-first rank per key; keep rank <= maxVersions,
    // and under TTL keep {version >= cutoff} ∪ {rank 1} (minVersions=1)
    val ranked = cells.withColumn("rk",
      row_number().over(Window.partitionBy(col("rowkey")).orderBy(col("version").desc)))
    val kept = ranked
      .filter(col("rk") <= maxVersions &&
        ttlCutoff.fold(lit(true))(c => col("version") >= c || col("rk") === 1))
      .select(lit(table).as("tableName"), col("rowkey"), col("version"), col("body"))

    val report = BulkLoad.writeCells(kept, root, config)
    val keepNames: Map[String, Set[String]] =
      report.segments.groupBy(_.shard).map { case (s, ds) => s -> ds.map(_.file).toSet }

    // sweep phase: fan the per-shard deletes out over the cluster; a
    // shard only ever holds cell files and segments (the DDL json
    // lives at table level), so everything not in the fresh segment
    // set is superseded
    val tableDir = Paths.get(root, table.replace(':', '~'))
    val shards =
      if (!Files.isDirectory(tableDir)) Seq.empty[String]
      else {
        val s = Files.list(tableDir)
        try s.iterator().asScala.filter(Files.isDirectory(_)).map(_.toString).toSeq
        finally s.close()
      }
    val keepB = spark.sparkContext.broadcast(keepNames)
    val removed = spark.sparkContext
      .parallelize(shards, math.max(1, math.min(shards.size, 32)))
      .map { shardPath =>
        val shard = Paths.get(shardPath)
        val keep = keepB.value.getOrElse(shard.getFileName.toString, Set.empty)
        var n = 0L
        val list = Files.list(shard)
        try list.iterator().asScala.foreach { p =>
          val name = p.getFileName.toString
          if (!keep.contains(name) && !name.endsWith(".tmp")) {
            if (Files.deleteIfExists(p)) n += 1
          }
        } finally list.close()
        n
      }.sum().toLong

    Report(report.cells, removed, report.segments)
  }
}
