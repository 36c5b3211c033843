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
  *    segment write path — each slice's DELETE MARKERS re-applied
  *    right after its cells (below).
  *
  * Backup layout: `<dir>/full/` + `<dir>/incr-<i>/` parquet exports,
  * a `<slice>-tombstones/` parquet sidecar per slice carrying its
  * delete markers as typed (rowkey, version) rows, and
  * `<dir>/_backup.json` (table, watermark, increment list, spec,
  * splits) written by atomic rename so a torn writer never leaves a
  * half-updated chain.
  *
  * DELETE TOMBSTONES travel with the chain (the HBase model: an
  * incremental backup is WAL replay, and the WAL carries Deletes).
  * The cell export is the connector's MASKED view — a masked cell is
  * never exported — but the markers themselves are: [[full]] exports
  * the table's complete live marker set; [[incremental]] exports the
  * DELTA (markers live now that no earlier slice recorded), so a
  * delete landing after the full backup — which produces NO cell row
  * in any export — still reaches [[restore]], which re-applies each
  * slice's markers via [[FileStore.deleteCells]] immediately after
  * bulk-loading that slice's cells. Restored markers persist exactly
  * as source markers do (purged by the restored table's own next
  * major), so `full → delete → incremental → restore` yields the
  * source's masked view — both ways (TombstoneSpec/BackupSpec pin it).
  *
  * Delivery contract (the q205 invariant): cells landing at versions
  * ≤ the watermark AFTER a backup pass are outside the incremental
  * guarantee — the same strictly-monotonic-version contract the
  * streaming face documents; the ingest pipeline's per-table
  * epoch-millis versions satisfy it for a single writer. Markers are
  * inside the guarantee regardless of their version (a delete's mask
  * bound T is naturally ≤ the watermark — it masks the past), because
  * delta export keys on marker EXISTENCE, not version. The one case
  * outside the guarantee: a source-side re-put at a version ≤ a
  * previously-exported marker's T after the source major-compacted
  * that marker away (the resurrection write is back-dated by
  * construction, violating the monotonic clock).
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
    /** Parsed through the real JSON tree ([[graft.core.Json]]) — the
      * embedded spec/splits objects are re-rendered compactly, which
      * is byte-identical to how this file wrote them (both sides are
      * insertion-ordered compact renderings). */
    def fromJson(json: String): Meta = {
      import graft.core.{JArr, JNum, JObj, JStr, Json}
      val o =
        try Json.parseObject(json)
        catch { case e: Exception =>
          throw new IllegalArgumentException(s"bad _backup.json: $json", e) }
      val table = o.get("table") match {
        case Some(JStr(s)) => s
        case _ => throw new IllegalArgumentException(s"bad _backup.json (table): $json")
      }
      val watermark = o.get("watermark") match {
        case Some(n: JNum) => n.toLongExact.getOrElse(
          throw new IllegalArgumentException(s"bad _backup.json (watermark): $json"))
        case _ => throw new IllegalArgumentException(s"bad _backup.json (watermark): $json")
      }
      val incs = o.get("increments") match {
        case Some(JArr(items)) => items.collect { case JStr(s) => s }
        case _ => Vector.empty[String]
      }
      def obj(k: String): Option[String] = o.get(k) match {
        case Some(j: JObj) => Some(Json.renderCompact(j))
        case _ => None
      }
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

  /** Export `df` to `dir` and return the max version EXPORTED, folded
    * into the write itself via `observe` (CollectMetrics) — the
    * watermark used to cost a second full scan of the just-written
    * export; at backup scale that extra pass is data-sized.
    * Long.MinValue for an empty export (null aggregate). */
  private def exportWithWatermark(df: DataFrame, dir: String): Long = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, max(col("version")).as("wm"))
      .write.mode("overwrite").parquet(dir)
    obs.get.get("wm") match {
      case Some(v: Long) => v
      case _ => Long.MinValue
    }
  }

  private def tombstoneDir(backupDir: String, slice: String) =
    s"$backupDir/$slice-tombstones"

  /** Export the given delete markers as the slice's typed-row sidecar
    * (rowkey BINARY, version BIGINT, exact BOOLEAN — `.dv`
    * exact-version markers travel in the same sidecar, kind-tagged).
    * Marker sets are the LIVE delete backlog — bounded between
    * majors — so a driver-side parallelize of the listing is the right
    * scale posture (the cells, which are data-sized, go through the
    * shard-parallel connector scan). */
  private def writeTombstones(spark: SparkSession, backupDir: String, slice: String,
                              markers: Seq[(Array[Byte], Long, Boolean)]): Unit = {
    import spark.implicits._
    spark.createDataset(markers)
      .toDF("rowkey", "version", "exact")
      .repartition(1)
      .write.mode("overwrite").parquet(tombstoneDir(backupDir, slice))
  }

  /** marker identity set of every slice already in the chain — used
    * by [[incremental]]'s delta and bounded by the chain's total
    * marker count. Sidecars from chains written before exact markers
    * existed lack the `exact` column — read as false. */
  private def exportedMarkers(spark: SparkSession, backupDir: String,
                              slices: Seq[String]): Set[(Seq[Byte], Long, Boolean)] =
    slices.flatMap { s =>
      val dir = tombstoneDir(backupDir, s)
      if (!Files.isDirectory(Paths.get(dir))) Seq.empty
      else withExactColumn(spark.read.parquet(dir)).collect()
        .map(r => (r.getAs[Array[Byte]]("rowkey").toSeq, r.getAs[Long]("version"),
          r.getAs[Boolean]("exact")))
    }.toSet

  private def withExactColumn(df: DataFrame): DataFrame =
    if (df.columns.contains("exact")) df else df.withColumn("exact", lit(false))

  /** Full backup: export every live cell, the table's live delete
    * markers, and record the watermark + table descriptor. Overwrites
    * any previous chain at `backupDir`. */
  def full(spark: SparkSession, root: String, table: String, backupDir: String): Meta = {
    val dir = backupDir + "/full"
    val wm = exportWithWatermark(readTable(spark, root, table), dir)
    val store = FileStore(root)
    writeTombstones(spark, backupDir, "full", store.listMarkers(table))
    val splits = store.splitsOf(table)
    val meta = Meta(table, wm, Vector.empty,
      store.readSpecJson(table),
      if (splits.isDefault) None else Some(splits.toJson))
    writeMeta(backupDir, meta)
    meta
  }

  /** Incremental backup: export exactly the cells above the chain's
    * recorded watermark (pushdown-pruned — sealed store files are
    * never opened) plus the DELTA of delete markers (live markers no
    * earlier slice recorded — a delete has no version floor, so the
    * delta keys on marker existence, not version), then advance the
    * watermark. */
  def incremental(spark: SparkSession, root: String, table: String, backupDir: String): Meta = {
    val prev = readMeta(backupDir)
    require(prev.table == table, s"backup chain at $backupDir is for table ${prev.table}, not $table")
    val name = s"incr-${prev.increments.size}"
    val dir = s"$backupDir/$name"
    val wm = exportWithWatermark(
      readTable(spark, root, table).filter(col("version") > prev.watermark), dir)
    val already = exportedMarkers(spark, backupDir, "full" +: prev.increments)
    val delta = FileStore(root).listMarkers(table)
      .filterNot { case (k, v, e) => already.contains((k.toSeq, v, e)) }
    writeTombstones(spark, backupDir, name, delta)
    val meta = prev.copy(
      watermark = math.max(prev.watermark, wm),
      increments = prev.increments :+ name)
    writeMeta(backupDir, meta)
    meta
  }

  /** Restore the chain into `dstRoot`: descriptor first (DDL +
    * splits), then full + every increment through the bulk-load path,
    * re-applying each slice's delete markers right after its cells
    * land (so a marker masks exactly what it masked at the source —
    * including cells from earlier slices, never-yet-loaded ones are
    * above its bound by the monotonic-version contract). Returns the
    * number of cells written (markers are masks, not cells). */
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
      val n = BulkLoad.writeCells(df, dstRoot).cells
      val tDir = tombstoneDir(backupDir, s)
      if (Files.isDirectory(Paths.get(tDir))) {
        // distributed marker application through the same write face
        // deletes take everywhere else — tombstone writes are
        // idempotent (tmp + atomic rename), so a retried task converges.
        // The analyzer resolves writes against the 3-column table
        // schema, so the marker frame carries an (ignored) empty body.
        // Bound and exact markers re-apply through their own write
        // faces (kind is a write option, not a column). ONE aggregation
        // decides which kinds are present, so an all-bound sidecar (the
        // common chain) costs one write pass, not two emptiness probes.
        val markers = withExactColumn(spark.read.parquet(tDir))
          .withColumn("body", lit(Array.emptyByteArray))
        val present = markers.groupBy(col("exact")).count()
          .collect().map(_.getBoolean(0)).toSet
        present.toSeq.sorted.foreach { exact =>
          markers.filter(col("exact") === exact).drop("exact")
            .write.format("graft-cells").mode("append")
            .option("root", dstRoot).option("table", meta.table)
            .option("tombstone", "true")
            .option("tombstoneExact", exact.toString).save()
        }
      }
      n
    }.sum
  }
}
