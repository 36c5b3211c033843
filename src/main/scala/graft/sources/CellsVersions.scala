package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** `tbl$versions` — the STORE-FILE INVENTORY metadata face (the
  * Iceberg `files` / Delta `DESCRIBE HISTORY` analog for this store):
  * one row per store file, from LISTINGS and GSE3 TRAILERS alone —
  * no index loads, no data-region I/O, planning-weight reads only.
  *
  * {{{
  *   shard  kind           file        cells distinct_keys min_version max_version bytes seq_no
  *   "3f"   segment        bulk-….seg  1842  977           101         9120        …     3
  *   "3f"   put            <digest>.v  1     null          v           v           …     null
  *   "3f"   marker_bound   <digest>.v.d  0   null          v           v           …     null
  *   "3f"   marker_exact   <digest>.v.dv 0   null          v           v           …     null
  * }}}
  *
  * What it answers that the data faces cannot, cheaply:
  *  - the table's VERSION WATERMARK (`max(max_version)`) — the
  *    discoverable version list for `VERSION AS OF` time travel;
  *  - compaction pressure (put/marker backlog per shard, segment
  *    counts and generations via `seq_no`) — what an operator reads
  *    before CALL compact_minor/major;
  *  - physical bytes per shard/kind (skew, region sizing).
  *
  * Read-only, batch-only; rows are bounded by the FILE count (kept
  * flat by compaction), never the cell count. One partition per shard
  * — the same region parallelism as every other face. */
object CellsVersions {
  val Schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("cells", LongType, nullable = false),
    StructField("distinct_keys", LongType, nullable = true),
    StructField("min_version", LongType, nullable = false),
    StructField("max_version", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("seq_no", LongType, nullable = true)))
}

case class CellsVersionsTable(root: String, table: String) extends Table with SupportsRead {
  override def name(): String = s"graft-cells:$table$$versions"
  override def schema(): StructType = CellsVersions.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = CellsVersionsScan(root, table) }
}

case class CellsVersionsScan(root: String, table: String) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = CellsVersions.Schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-cells-versions table=$table"
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(root, table.replace(':', '~'))
    CellsShards.prune(dir, CellsKeyPred.All)
      .map(p => CellsVersionsShard(p.toString): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = CellsVersionsReaderFactory()

  /** EXACT row stats from the same listings the scan pays: inventory
    * rows = store files, so `cells JOIN inventory` sizes the inventory
    * side as the (compaction-bounded) file count and earns a broadcast
    * — without this the unknown-size side blocks the plan a q252-style
    * provenance audit wants. ~120 B/row: 9 mostly-fixed columns + a
    * file name. */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val fileCount: Long = {
      val dir = Paths.get(root, table.replace(':', '~'))
      CellsShards.prune(dir, CellsKeyPred.All).map { shard =>
        val s = Files.list(Paths.get(shard.toString))
        try s.iterator().asScala.count { p =>
          val n = p.getFileName.toString
          !n.endsWith(".tmp") && !n.startsWith("_") && Files.isRegularFile(p)
        } finally s.close()
      }.sum.toLong
    }
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(fileCount)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(fileCount * 120L)
  }
}

case class CellsVersionsShard(dir: String) extends InputPartition

case class CellsVersionsReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val shard = Paths.get(partition.asInstanceOf[CellsVersionsShard].dir)
      private val shardName = shard.getFileName.toString
      private val rows: Iterator[InternalRow] = {
        val s = Files.list(shard)
        try s.iterator().asScala.flatMap { p =>
          val n = p.getFileName.toString
          def row(kind: String, cells: Long, dk: Any, minV: Long, maxV: Long, seq: Any) =
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(shardName), UTF8String.fromString(kind),
              UTF8String.fromString(n), cells, dk, minV, maxV, Files.size(p), seq))
          if (n.endsWith(".tmp")) None
          else if (graft.ingest.CellSegment.isSegment(n)) {
            val t = graft.ingest.CellSegment.readTrailer(p)
            Some(row("segment", t.entryCount.toLong, t.distinctKeys.toLong,
              t.minVersion, t.maxVersion, t.seqNo))
          } else graft.ingest.FileStore.tombstoneOf(n) match {
            case Some((_, v)) => Some(row("marker_bound", 0L, null, v, v, null))
            case None => graft.ingest.FileStore.exactTombstoneOf(n) match {
              case Some((_, v)) => Some(row("marker_exact", 0L, null, v, v, null))
              case None =>
                val dot = n.lastIndexOf('.')
                if (dot <= 0) None
                else n.drop(dot + 1).toLongOption.map(v => row("put", 1L, null, v, v, null))
            }
          }
        }.toVector.iterator
        finally s.close()
      }
      private var cur: InternalRow = _
      override def next(): Boolean = { if (rows.hasNext) { cur = rows.next(); true } else false }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}
