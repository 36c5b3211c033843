package graft.sources

import graft.ingest.{Backup, Compaction}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** MAINTENANCE as SQL — the store's lifecycle operators surfaced
  * through Spark 4's ProcedureCatalog (`CALL cat.compact_major(table
  * => 'tbl')`), the Iceberg-procedures idiom an operations user
  * expects: compactions, backups, and restores runnable from a SQL
  * shell with no Scala anywhere. Each procedure executes DRIVER-side
  * and delegates to the existing operators (the Spark jobs inside them
  * are the distributed part); the one-row result surfaces the
  * operator's report, so a `CALL` is auditable in-query.
  *
  * Reference posture: the reference relies on operated HBase, where
  * these are hbase-shell verbs (`major_compact`, snapshot/export) —
  * this is that shell surface for the sandbox store.
  */
object CellsProcedures {

  private def param(name: String, dt: DataType) = ProcedureParameter.in(name, dt).build()
  private def paramD(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def resultScan(schema: StructType, values: Array[Any]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(new GenericInternalRow(values))
    }).iterator()

  private abstract class Proc(procName: String,
                              params: Array[ProcedureParameter],
                              resultSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    protected def run(spark: SparkSession, input: InternalRow): Array[Any]
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      resultScan(resultSchema, run(SparkSession.active, input))
  }

  private val CompactResult = StructType(Seq(
    StructField("kept_cells", LongType, nullable = false),
    StructField("removed_files", LongType, nullable = false),
    StructField("segments", LongType, nullable = false)))

  def all(root: String): Map[String, UnboundProcedure] = Map(
    // CALL cat.compact_major(table => 't' [, ttl_cutoff => v]):
    // maxVersions/TTL GC off the table's own DDL; an explicit
    // ttl_cutoff overrides the descriptor-derived one
    "compact_major" -> new Proc("compact_major",
      Array(param("table", StringType), paramD("ttl_cutoff", LongType, "NULL")),
      CompactResult) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val cutoff = if (in.numFields > 1 && !in.isNullAt(1)) Some(in.getLong(1)) else None
        val r = Compaction.major(spark, root, in.getUTF8String(0).toString, ttlCutoff = cutoff)
        Array(r.keptCells, r.removedFiles, r.segments.size.toLong)
      }
    },
    // CALL cat.compact_minor(table => 't' [, max_input_bytes => b]):
    // the region-local small-file merge, no GC, no shuffle
    "compact_minor" -> new Proc("compact_minor",
      Array(param("table", StringType),
        paramD("max_input_bytes", LongType, (32L << 20).toString)),
      CompactResult) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val cap = if (in.numFields > 1 && !in.isNullAt(1)) in.getLong(1) else 32L << 20
        val r = Compaction.minor(spark, root, in.getUTF8String(0).toString, cap)
        Array(r.keptCells, r.removedFiles, r.segments.size.toLong)
      }
    },
    // CALL cat.backup_full(table => 't', dir => '/path')
    "backup_full" -> new Proc("backup_full",
      Array(param("table", StringType), param("dir", StringType)),
      StructType(Seq(StructField("watermark", LongType, nullable = false),
        StructField("increments", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val m = Backup.full(spark, root, in.getUTF8String(0).toString,
          in.getUTF8String(1).toString)
        Array(m.watermark, m.increments.size.toLong)
      }
    },
    // CALL cat.backup_incremental(table => 't', dir => '/path')
    "backup_incremental" -> new Proc("backup_incremental",
      Array(param("table", StringType), param("dir", StringType)),
      StructType(Seq(StructField("watermark", LongType, nullable = false),
        StructField("increments", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val m = Backup.incremental(spark, root, in.getUTF8String(0).toString,
          in.getUTF8String(1).toString)
        Array(m.watermark, m.increments.size.toLong)
      }
    },
    // CALL cat.restore_backup(dir => '/path'): rebuilds the chain's
    // table into THIS catalog's root (descriptor + splits + markers)
    "restore_backup" -> new Proc("restore_backup",
      Array(param("dir", StringType)),
      StructType(Seq(StructField("cells", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] =
        Array(Backup.restore(spark, in.getUTF8String(0).toString, root))
    },
    // CALL cat.vacuum([older_than_ms => 86400000]): sweep orphaned
    // overwrite-staging/trash generations and torn-task .tmp files —
    // the CleanerChore / remove_orphan_files verb. Age-gated so an
    // ACTIVE overwrite's staging dir survives; 0 sweeps everything.
    "vacuum" -> new Proc("vacuum",
      Array(paramD("older_than_ms", LongType, (24L * 3600 * 1000).toString)),
      StructType(Seq(
        StructField("staging_swept", LongType, nullable = false),
        StructField("trash_swept", LongType, nullable = false),
        StructField("tmp_files", LongType, nullable = false),
        StructField("bytes_reclaimed", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val age = if (in.numFields > 0 && !in.isNullAt(0)) in.getLong(0)
                  else 24L * 3600 * 1000
        val r = graft.ingest.Vacuum.sweep(root, age)
        Array(r.stagingSwept, r.trashSwept, r.tmpFiles, r.bytesReclaimed)
      }
    },
    // CALL cat.merge_regions(table => 't', region => '<startHex>'):
    // HBase merge_region — fold the named region into its LEFT
    // neighbor (boundary removed, files parked + folded; readers stay
    // exactly-once via the layout-stale coverage rule). The inverse of
    // the automatic split; operator-invoked, like HBase's.
    "merge_regions" -> new Proc("merge_regions",
      Array(param("table", StringType), param("region", StringType)),
      StructType(Seq(StructField("merged", BooleanType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] =
        Array(graft.ingest.RegionSplit.mergeLeft(root,
          in.getUTF8String(0).toString, in.getUTF8String(1).toString))
    },
    // CALL cat.check_and_put(table => 't', rowkey => 'k', body => 'v'
    //   [, expected => 'old'] [, version => ts]): HBase checkAndPut —
    // compare-and-set against the key's masked latest body (omitted
    // expected = expect ABSENT); atomic against other atomic verbs on
    // the key. UTF-8 string key/body face — the SQL shell's CAS.
    "check_and_put" -> new Proc("check_and_put",
      Array(param("table", StringType), param("rowkey", StringType),
        param("body", StringType), paramD("expected", StringType, "NULL"),
        paramD("version", LongType, "NULL")),
      StructType(Seq(StructField("applied", BooleanType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val expected =
          if (in.numFields > 3 && !in.isNullAt(3))
            Some(in.getUTF8String(3).toString.getBytes("UTF-8"))
          else None
        val store = graft.ingest.FileStore(root)
        val table = in.getUTF8String(0).toString
        val rowkey = in.getUTF8String(1).toString.getBytes("UTF-8")
        val body = in.getUTF8String(2).toString.getBytes("UTF-8")
        // omitted version → the store's serving-winner default
        // (max(wall clock, latest+1), computed under the key lock —
        // ADVICE r16: a bare wall-clock default on a future-dated
        // table would apply without ever serving)
        Array(
          if (in.numFields > 4 && !in.isNullAt(4))
            store.checkAndPut(table, rowkey, expected, in.getLong(4), body)
          else store.checkAndPut(table, rowkey, expected, body))
      }
    },
    // CALL cat.check_and_delete(table => 't', rowkey => 'k'
    //   [, expected => 'old']): HBase checkAndDelete — compare the
    // key's masked latest body (omitted expected = expect ABSENT) and
    // delete the ROW iff it matches; atomic against the other verbs
    // on the key
    "check_and_delete" -> new Proc("check_and_delete",
      Array(param("table", StringType), param("rowkey", StringType),
        paramD("expected", StringType, "NULL")),
      StructType(Seq(StructField("applied", BooleanType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val expected =
          if (in.numFields > 2 && !in.isNullAt(2))
            Some(in.getUTF8String(2).toString.getBytes("UTF-8"))
          else None
        Array(graft.ingest.FileStore(root).checkAndDelete(
          in.getUTF8String(0).toString,
          in.getUTF8String(1).toString.getBytes("UTF-8"), expected))
      }
    },
    // CALL cat.append(table => 't', rowkey => 'k', value => 'suffix'):
    // HBase append — concatenate onto the latest live body (absent =
    // empty) as a new serving version; returns the new body
    "append" -> new Proc("append",
      Array(param("table", StringType), param("rowkey", StringType),
        param("value", StringType)),
      StructType(Seq(StructField("value", StringType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val out = graft.ingest.FileStore(root).append(
          in.getUTF8String(0).toString,
          in.getUTF8String(1).toString.getBytes("UTF-8"),
          in.getUTF8String(2).toString.getBytes("UTF-8"))
        Array(org.apache.spark.unsafe.types.UTF8String.fromBytes(out))
      }
    },
    // CALL cat.increment(table => 't', rowkey => 'k' [, delta => n]):
    // HBase increment — the latest live body as a big-endian 8-byte
    // counter (absent = 0), bumped atomically as a new version
    "increment" -> new Proc("increment",
      Array(param("table", StringType), param("rowkey", StringType),
        paramD("delta", LongType, "1")),
      StructType(Seq(StructField("value", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val delta = if (in.numFields > 2 && !in.isNullAt(2)) in.getLong(2) else 1L
        Array(graft.ingest.FileStore(root).increment(
          in.getUTF8String(0).toString,
          in.getUTF8String(1).toString.getBytes("UTF-8"), delta))
      }
    },
    // CALL cat.snapshot(table => 't', name => 's1'): ZERO-COPY pin of
    // the table's store-file set (hard links + descriptor/layout
    // copies — the HBase `snapshot` verb): majors, TTL sweeps,
    // deletes, truncates, and vacuum thereafter only unlink the
    // table's NAMES; the snapshot keeps the bytes until dropped.
    "snapshot" -> new Proc("snapshot",
      Array(param("table", StringType), param("name", StringType)),
      StructType(Seq(StructField("files_pinned", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] =
        Array(graft.ingest.Snapshots.create(root, in.getUTF8String(0).toString,
          in.getUTF8String(1).toString).files)
    },
    // CALL cat.clone_snapshot(name => 's1', new_table => 't2'): the
    // HBase clone — materialize an independent table from the pinned
    // set (links into a staged generation, one atomic commit rename)
    "clone_snapshot" -> new Proc("clone_snapshot",
      Array(param("name", StringType), param("new_table", StringType)),
      StructType(Seq(StructField("files_linked", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] =
        Array(graft.ingest.Snapshots.clone(root, in.getUTF8String(0).toString,
          in.getUTF8String(1).toString))
    },
    // CALL cat.restore_snapshot(name => 's1'): IN-PLACE restore of the
    // snapshot's source table (HBase restore_snapshot) — the RTAS
    // two-rename swap fed by the snapshot's hard links: atomic from
    // the readers' side, and a poisoned restore leaves the live table
    // untouched
    "restore_snapshot" -> new Proc("restore_snapshot",
      Array(param("name", StringType)),
      StructType(Seq(StructField("files_restored", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] =
        Array(graft.ingest.Snapshots.restore(root, in.getUTF8String(0).toString))
    },
    // CALL cat.list_snapshots(): one row per snapshot (HBase
    // list_snapshots) — name, pinned table, files, creation time
    "list_snapshots" -> new Proc("list_snapshots",
      Array.empty[ProcedureParameter],
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("table", StringType, nullable = false),
        StructField("files", LongType, nullable = false),
        StructField("created_millis", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] =
        throw new UnsupportedOperationException("multi-row: see call()")
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val schema = StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("table", StringType, nullable = false),
          StructField("files", LongType, nullable = false),
          StructField("created_millis", LongType, nullable = false)))
        val rowsOut: Array[InternalRow] = graft.ingest.Snapshots.list(root).map { m =>
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(m.name),
            org.apache.spark.unsafe.types.UTF8String.fromString(m.table),
            m.files, m.createdMillis)): InternalRow
        }.toArray
        java.util.List.of[Scan](new LocalScan {
          override def readSchema(): StructType = schema
          override def rows(): Array[InternalRow] = rowsOut
        }).iterator()
      }
    },
    // CALL cat.drop_snapshot(name => 's1'): release the pins
    "drop_snapshot" -> new Proc("drop_snapshot",
      Array(param("name", StringType)),
      StructType(Seq(StructField("dropped", BooleanType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] =
        Array(graft.ingest.Snapshots.drop(root, in.getUTF8String(0).toString))
    },
    // CALL cat.resplit(table => 't', dst_root => '/path',
    //                  split_points => '<hex>,…'): the layout MIGRATION
    // (resharding live data is a rewrite into a new root, never a
    // re-point — the write-once layout contract)
    "resplit" -> new Proc("resplit",
      Array(param("table", StringType), param("dst_root", StringType),
        param("split_points", StringType)),
      StructType(Seq(StructField("cells", LongType, nullable = false),
        StructField("segments", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Array[Any] = {
        val points = in.getUTF8String(2).toString.split(',').toSeq.map { hex =>
          graft.ingest.FileStore.Splits.startOf(hex.trim).getOrElse(
            throw new IllegalArgumentException(
              s"split_points takes comma-separated lowercase-hex keys, got '$hex'"))
        }
        val r = graft.ingest.Resplit.to(spark, root, in.getUTF8String(0).toString,
          in.getUTF8String(1).toString, graft.ingest.FileStore.Splits.ofSplitPoints(points))
        Array(r.cells, r.segments.size.toLong)
      }
    })
}
