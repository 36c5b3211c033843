package graft.queries

import graft.ingest.{BulkLoad, CellSegment, Compaction, FileStore, PushTableSink}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Cell-store MAINTENANCE lifecycle over the bulk-load machinery —
  * round 10's closers on the HBase-analog story: in-place major
  * compaction with version GC (q194) and a digest-verified
  * backup/restore round-trip whose restore path IS the bulk load
  * (q195). Both gate rows derive every byte from the documents table,
  * so the DuckDB oracle re-derives the same logical content with no
  * engine-side state.
  */
object StoreLifecycle {

  private def segFiles(root: String, tableDirName: String): Seq[String] = {
    val dir = Paths.get(root, tableDirName)
    val shards = Files.list(dir)
    try shards.iterator().asScala.filter(Files.isDirectory(_)).flatMap { s =>
      val l = Files.list(s)
      try l.iterator().asScala.map(_.getFileName.toString).toVector finally l.close()
    }.toVector
    finally shards.close()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Major compaction through the full store-file mix: versions 1-2
    // land as one bulk segment generation, version 3 as a second
    // (overlapping segments per shard), versions 4-5 as per-cell put
    // files through the connector write face — then Compaction.major
    // rewrites the table under its maxVersions=3 DDL. In-query
    // invariants: 5 versions per key before, exactly the newest 3
    // after, and the post-compact store holds ONLY fresh segments
    // (every put file and superseded segment swept). The oracle
    // re-derives the retained slice straight from documents, proving
    // the GC semantics end to end; the connector read after the sweep
    // proves the rewritten segments carry the bytes.
    "q194_cells_major_compact" -> { (s, d) =>
      val root = Files.createTempDirectory("graft-q194-cells").toString
      try {
        val spec = PushTableSink.TableSpec(maxVersions = 3)
        def seed(vLo: Int, vHi: Int) = Tables.documents(s, d)
          .filter(col("doc_id") % 11 === 0)
          .select(col("doc_id"), explode(sequence(lit(vLo), lit(vHi))).as("v"))
          .select(lit("q194").as("tableName"),
            expr("cast(concat('doc-', doc_id) as binary)").as("rowkey"),
            expr("doc_id * 8 + v").as("version"),
            expr("cast(md5(concat(cast(doc_id as string), '-', cast(v as string))) as binary)").as("body"))
        BulkLoad.writeCells(seed(1, 2), root, BulkLoad.Config(tableSpec = spec))
        BulkLoad.writeCells(seed(3, 3), root, BulkLoad.Config(tableSpec = spec))
        seed(4, 5).drop("tableName").write.format("graft-cells").mode("append")
          .option("root", root).option("table", "q194").save()
        def readTable = s.read.format("graft-cells")
          .option("root", root).option("table", "q194").load()
        val before = readTable.count()
        val report = Compaction.major(s, root, "q194")
        val res = readTable
          .select(col("rowkey").cast("string").as("key_str"), col("version"),
            col("body").cast("string").as("body_md5"))
          .localCheckpoint()
        val after = res.count()
        require(after > 0 && after == report.keptCells && 3L * before == 5L * after,
          s"maxVersions=3 must keep 3 of 5 versions per key: before=$before after=$after kept=${report.keptCells}")
        val files = segFiles(root, "q194")
        require(files.nonEmpty && files.forall(CellSegment.isSegment),
          "post-compact store must hold only fresh segments")
        res
      } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    },

    // Backup/restore round-trip: the live table (seeded through the
    // connector write face) exports to parquet — a shard-parallel
    // connector scan, the portable cold format — and restores into a
    // FRESH store root via the bulk-load path (the HBase
    // ExportSnapshot → LoadIncrementalHFiles idiom: restore never
    // replays puts, it rebuilds store files directly). In-query
    // invariant: restored state ≡ source state cell-for-cell
    // (exceptAll both ways); the emitted result reads from the
    // RESTORED store, so the driver hash pins the whole chain —
    // export fidelity, parquet round-trip, bulk rebuild, and the
    // segment read face.
    "q195_cells_backup_restore" -> { (s, d) =>
      val srcRoot = Files.createTempDirectory("graft-q195-src").toString
      val bakDir = Files.createTempDirectory("graft-q195-bak").toString
      val dstRoot = Files.createTempDirectory("graft-q195-dst").toString
      try {
        Tables.documents(s, d).filter(col("doc_id") % 13 === 0)
          .select(col("doc_id"), explode(sequence(lit(1), lit(2))).as("v"))
          .select(expr("cast(concat('doc-', doc_id) as binary)").as("rowkey"),
            expr("doc_id * 4 + v").as("version"),
            expr("cast(md5(concat(cast(doc_id as string), '~', cast(v as string))) as binary)").as("body"))
          .write.format("graft-cells").mode("append")
          .option("root", srcRoot).option("table", "q195").save()
        def readTable(root: String) = s.read.format("graft-cells")
          .option("root", root).option("table", "q195").load()
        // export: connector scan -> parquet backup
        readTable(srcRoot).write.mode("overwrite").parquet(bakDir + "/q195")
        // restore: parquet -> bulk segments in a fresh root
        BulkLoad.writeCells(
          s.read.parquet(bakDir + "/q195").select(lit("q195").as("tableName"),
            col("rowkey"), col("version"), col("body")), dstRoot)
        val src = readTable(srcRoot)
        val dst = readTable(dstRoot)
        require(src.exceptAll(dst).count() == 0 && dst.exceptAll(src).count() == 0,
          "restored store must match the source cell-for-cell")
        dst.select(col("rowkey").cast("string").as("key_str"), col("version"),
            col("body").cast("string").as("body_md5"))
          .localCheckpoint()
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(srcRoot))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bakDir))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dstRoot))
      }
    },

    // REGION PRE-SPLIT planner: 15 balanced split keys over the binary
    // rowkey space (16 equal-mass ranges) — what an HBase operator
    // computes before pointing a bulk load at a new table, so region
    // splits never happen mid-ingest (reference posture:
    // HbaseClient.kt's region model; the first-byte shard uniformity
    // comes from the CRC32 prefix, and THIS op is how you'd split
    // finer than one byte). Keys are digest-derived binaries (both
    // engines can compute them); boundaries are exact equi-depth
    // ranks (i·n div 16) read off GlobalRank's range-partitioned
    // total order — one range shuffle, no single-task sort, the q63
    // decomposition on BINARY keys.
    "q204_split_points" -> { (s, d) =>
      import graft.operators.GlobalRank
      val keys = Tables.documents(s, d)
        .select(unhex(md5(concat(lit("doc-"), col("doc_id")))).as("key"))
      val n = keys.count() // one bounded scalar: the total mass
      val targets = (1 to 15).map(i => i * n / 16)
      GlobalRank.rank(keys, Seq(col("key").asc), numParts = 32, rankCol = "boundary_rank")
        .filter(col("boundary_rank").isin(targets: _*))
        .select(col("boundary_rank"), hex(col("key")).as("split_key_hex"))
    },

    // INCREMENTAL backup — the CDC face of q195: a full backup at
    // version watermark W, then only the cells ABOVE W export in the
    // second pass (a FILENAME/trailer-pruned pushdown scan — expired
    // generations are never opened), and both increments restore
    // through the bulk load into one root. In-query invariants: the
    // incremental export is exactly the post-W slice, and
    // full + increment restored ≡ the live table cell-for-cell. The
    // emitted result reads the RESTORED store, so the hash pins
    // watermark pruning, both exports, and the two bulk rebuilds.
    "q205_cells_incremental_backup" -> { (s, d) =>
      val W = 1000L
      val srcRoot = Files.createTempDirectory("graft-q205-src").toString
      val bakDir = Files.createTempDirectory("graft-q205-bak").toString
      val dstRoot = Files.createTempDirectory("graft-q205-dst").toString
      try {
        Tables.documents(s, d).filter(col("doc_id") % 17 === 0)
          .select(col("doc_id"), explode(sequence(lit(1), lit(2))).as("v"))
          .select(expr("cast(concat('doc-', doc_id) as binary)").as("rowkey"),
            expr("doc_id * 4 + v").as("version"),
            expr("cast(md5(concat(cast(doc_id as string), '+', cast(v as string))) as binary)").as("body"))
          .write.format("graft-cells").mode("append")
          .option("root", srcRoot).option("table", "q205").save()
        def readTable(root: String) = s.read.format("graft-cells")
          .option("root", root).option("table", "q205").load()
        readTable(srcRoot).filter(col("version") <= W)
          .write.mode("overwrite").parquet(bakDir + "/full")
        readTable(srcRoot).filter(col("version") > W)
          .write.mode("overwrite").parquet(bakDir + "/incr")
        def restore(dir: String): Unit = BulkLoad.writeCells(
          s.read.parquet(dir).select(lit("q205").as("tableName"),
            col("rowkey"), col("version"), col("body")), dstRoot)
        restore(bakDir + "/full")
        restore(bakDir + "/incr")
        val src = readTable(srcRoot)
        val dst = readTable(dstRoot)
        require(src.exceptAll(dst).count() == 0 && dst.exceptAll(src).count() == 0,
          "full + incremental restore must reproduce the live table cell-for-cell")
        dst.select(col("rowkey").cast("string").as("key_str"), col("version"),
            col("body").cast("string").as("body_md5"))
          .localCheckpoint()
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(srcRoot))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(bakDir))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dstRoot))
      }
    }
  )

  val oracle: Map[String, String] = Map(
    // the retained slice: newest 3 of versions 1..5 per key = v in 3..5
    "q194_cells_major_compact" ->
      """SELECT 'doc-' || doc_id AS key_str, (doc_id * 8 + v)::BIGINT AS version,
              md5(doc_id::VARCHAR || '-' || v::VARCHAR) AS body_md5
         FROM documents, (SELECT unnest([3, 4, 5]) AS v)
         WHERE doc_id % 11 = 0""",
    "q195_cells_backup_restore" ->
      """SELECT 'doc-' || doc_id AS key_str, (doc_id * 4 + v)::BIGINT AS version,
              md5(doc_id::VARCHAR || '~' || v::VARCHAR) AS body_md5
         FROM documents, (SELECT unnest([1, 2]) AS v)
         WHERE doc_id % 13 = 0""",

    // hex(md5) sorts identically to the digest bytes, so ranking the
    // lowercase digest string IS the binary-key total order
    "q204_split_points" ->
      """WITH k AS (SELECT md5('doc-' || doc_id) AS kh FROM documents),
          r AS (SELECT kh, row_number() OVER (ORDER BY kh) AS rk,
                  count(*) OVER () AS n
                FROM k)
         SELECT rk::BIGINT AS boundary_rank, upper(kh) AS split_key_hex
         FROM r
         WHERE rk IN (SELECT (i * (SELECT count(*) FROM k)) // 16
                      FROM (SELECT unnest(range(1, 16)) AS i))""",

    "q205_cells_incremental_backup" ->
      """SELECT 'doc-' || doc_id AS key_str, (doc_id * 4 + v)::BIGINT AS version,
              md5(doc_id::VARCHAR || '+' || v::VARCHAR) AS body_md5
         FROM documents, (SELECT unnest([1, 2]) AS v)
         WHERE doc_id % 17 = 0"""
  )
}
