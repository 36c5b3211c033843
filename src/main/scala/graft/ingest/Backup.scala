package graft.ingest

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BACKUP / RESTORE operators for the cell store — the HBase
  * `ExportSnapshot` → `LoadIncrementalHFiles` idiom as a first-class
  * API, completing the lifecycle the q195/q205 gate rows exercise:
  *
  *  - [[full]]: shard-parallel connector scan of the live table into a
  *    parquet export (the portable cold format), RECORDING the version
  *    watermark — the max version exported — in the backup's own
  *    metadata, alongside the table's DDL (`_spec.json`) and split
  *    layout (`_splits.json`). The descriptor travels WITH the backup,
  *    as HBase snapshots carry the table descriptor: restore must not
  *    re-derive retention or region boundaries from config defaults.
  *  - [[incremental]]: exports exactly the cells ABOVE the recorded
  *    watermark — a filename/trailer-pruned pushdown scan, so sealed
  *    generations are never opened — then advances the watermark. Any
  *    number of increments chain.
  *  - [[restore]]: rebuilds a store root from the chain via
  *    [[BulkLoad]] (never replays puts): DDL and splits land first, so
  *    the rebuilt table keeps its retention contract and region
  *    layout, then full + increments flow through the one-shuffle
  *    segment write path.
  *
  * Backup layout: `<dir>/full/` + `<dir>/incr-<i>/` parquet exports and
  * `<dir>/_backup.json` (table, watermark, increment list, spec,
  * splits) written by atomic rename so a torn writer never leaves a
  * half-updated chain.
  *
  * Delivery contract (the q205 invariant): cells landing at versions
  * ≤ the watermark AFTER a backup pass are outside the incremental
  * guarantee — the same strictly-monotonic-version contract the
  * streaming face documents; the ingest pipeline's per-table
  * epoch-millis versions satisfy it for a single writer.
  *
  * Delete tombstones: the export is the connector's MASKED view, so a
  * backup applies pending deletes exactly as a major compaction would
  * — masked cells are not exported and no markers land in the
  * restored store (an old-version re-put there resurrects, while the
  * source keeps masking until its own major). TombstoneSpec pins both
  * sides.
  *
  * Reference posture: the reference relies on HBase itself for
  * snapshot/export (its store is operated, not embedded) — these
  * operators ARE that machinery for the sandbox store, re-derived from
  * the public HBase backup model.
  */
object Backup {

  final case class Meta(table: String, watermark: Long, increments: Vector[String],
                        specJson: Option[String], splitsJson: Option[String]) {
    def toJson: String = {
      val incs = increments.map(i => "\"" + i + "\"").mkString("[", ",", "]")
      s"""{"table":"$table","watermark":$watermark,"increments":$incs,""" +
        s""""spec":${specJson.getOrElse("null")},"splits":${splitsJson.getOrElse("null")}}"""
    }
  }

  object Meta {
    def fromJson(json: String): Meta = {
      val table = """"table":"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))
        .getOrElse(throw new IllegalArgumentException(s"bad _backup.json: $json"))
      val watermark = """"watermark":(-?\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(s"bad _backup.json: $json"))
      val incs = """"increments":\[([^\]]*)\]""".r.findFirstMatchIn(json).map(_.group(1))
        .map(s => """"([^"]*)"""".r.findAllMatchIn(s).map(_.group(1)).toVector)
        .getOrElse(Vector.empty)
      // spec and splits are FLAT json objects (no nested braces)
      def obj(k: String): Option[String] =
        (s""""$k":(\\{[^}]*\\})""").r.findFirstMatchIn(json).map(_.group(1))
      Meta(table, watermark, incs, obj("spec"), obj("splits"))
    }
  }

  private def metaPath(backupDir: String) = Paths.get(backupDir, "_backup.json")

  def readMeta(backupDir: String): Meta =
    Meta.fromJson(new String(Files.readAllBytes(metaPath(backupDir)), "UTF-8"))

  private def writeMeta(backupDir: String, meta: Meta): Unit = {
    val dir = Files.createDirectories(Paths.get(backupDir))
    val tmp = Files.createTempFile(dir, "_backup", ".tmp")
    Files.write(tmp, meta.toJson.getBytes("UTF-8"))
    Files.move(tmp, metaPath(backupDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def readTable(spark: SparkSession, root: String, table: String): DataFrame =
    spark.read.format("graft-cells").option("root", root).option("table", table).load()

  /** max version of an export directory — one parquet pass over the
    * (bounded) backup slice; Long.MinValue for an empty export. */
  private def maxVersionOf(spark: SparkSession, dir: String): Long = {
    val r = spark.read.parquet(dir).agg(max(col("version"))).collect()(0)
    if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
  }

  /** Full backup: export every live cell, record the watermark + table
    * descriptor. Overwrites any previous chain at `backupDir`. */
  def full(spark: SparkSession, root: String, table: String, backupDir: String): Meta = {
    val dir = backupDir + "/full"
    readTable(spark, root, table).write.mode("overwrite").parquet(dir)
    val store = FileStore(root)
    val splits = store.splitsOf(table)
    val meta = Meta(table, maxVersionOf(spark, dir), Vector.empty,
      store.readSpecJson(table),
      if (splits.isDefault) None else Some(splits.toJson))
    writeMeta(backupDir, meta)
    meta
  }

  /** Incremental backup: export exactly the cells above the chain's
    * recorded watermark (pushdown-pruned — sealed store files are
    * never opened), then advance it. */
  def incremental(spark: SparkSession, root: String, table: String, backupDir: String): Meta = {
    val prev = readMeta(backupDir)
    require(prev.table == table, s"backup chain at $backupDir is for table ${prev.table}, not $table")
    val name = s"incr-${prev.increments.size}"
    val dir = s"$backupDir/$name"
    readTable(spark, root, table).filter(col("version") > prev.watermark)
      .write.mode("overwrite").parquet(dir)
    val meta = prev.copy(
      watermark = math.max(prev.watermark, maxVersionOf(spark, dir)),
      increments = prev.increments :+ name)
    writeMeta(backupDir, meta)
    meta
  }

  /** Restore the chain into `dstRoot`: descriptor first (DDL +
    * splits), then full + every increment through the bulk-load path.
    * Returns the number of cells written. */
  def restore(spark: SparkSession, backupDir: String, dstRoot: String): Long = {
    val meta = readMeta(backupDir)
    val store = FileStore(dstRoot)
    store.ensureTable(meta.table,
      meta.specJson.map(PushTableSink.TableSpec.fromJson).getOrElse(PushTableSink.TableSpec()))
    meta.splitsJson.foreach(j => store.ensureSplits(meta.table, FileStore.Splits.fromJson(j)))
    val slices = "full" +: meta.increments
    slices.map { s =>
      val df = spark.read.parquet(s"$backupDir/$s")
        .select(lit(meta.table).as("tableName"), col("rowkey"), col("version"), col("body"))
      BulkLoad.writeCells(df, dstRoot).cells
    }.sum
  }
}
