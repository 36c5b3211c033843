package graft.sources

import graft.ingest.{BulkLoad, FileStore, PushTableSink}
import graft.ingest.PushTableSink.CellPut
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SupportsMetadataColumns — the Iceberg `_file` idiom: `_shard`,
  * `_file`, `_kind` name the store file whose copy WON read precedence
  * for each emitted row. SELECT-only (a `SELECT *` stays the 3-column
  * cell schema); joins against the `$versions` inventory face on
  * (_shard, _file). */
class CellsMetadataColumnsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("cells-metacols").toString
    spark = SparkSession.builder().master("local[4]")
      .appName("cells-metacols-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.catalog.gmc", classOf[CellsCatalog].getName)
      .config("spark.sql.catalog.gmc.root", root)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sp = spark; import sp.implicits._
    // segment-resident cells (bulk), one put-backlog cell, one marker
    BulkLoad.writeCells(
      (0 until 20).map(i => ("mc", f"M-$i%02d".getBytes("UTF-8"), 10L, s"seg-$i".getBytes("UTF-8")))
        .toDF("tableName", "rowkey", "version", "body"), root)
    FileStore(root).putBatch("mc",
      Seq(CellPut("mc", "M-99".getBytes("UTF-8"), 20L, "fresh".getBytes("UTF-8"))))
    FileStore(root).deleteCells("mc", Seq(("M-05".getBytes("UTF-8"), 10L)))
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("_kind reports the winning store file's type; SELECT * stays the cell schema") {
    val rows = spark.sql(
      """SELECT cast(rowkey as string) AS k, _kind, _file, _shard
         FROM gmc.mc""").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val byKind = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byKind("segment") == 19, s"$byKind") // M-05 is masked
    assert(byKind("put") == 1)
    assert(rows.filter(_._2 == "put").head._1 == "M-99")
    assert(rows.forall(r => r._3.nonEmpty && r._4.nonEmpty))
    // every (_shard, _file) provenance joins against the $versions inventory
    val inv = spark.sql("SELECT shard, file FROM gmc.`mc$versions`")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.forall(r => inv.contains((r._4, r._3))),
      "provenance must name real inventory files")
    // metadata columns are SELECT-only
    assert(spark.table("gmc.mc").columns.toSeq == Seq("rowkey", "version", "body"))
  }

  test("the change-feed face reports marker kinds") {
    val kinds = spark.sql(
      """SELECT op, _kind FROM gmc.`mc$changes`""").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kinds.contains(("put", "segment")) && kinds.contains(("put", "put")))
    assert(kinds.contains(("delete", "marker_bound")), s"$kinds")
  }
}
