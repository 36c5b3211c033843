package graft.sources

import graft.ingest.{BulkLoad, CellSegment}
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Runtime (join-driven) rowkey filtering — DSv2
  * SupportsRuntimeFiltering on the batch scan: when the cell table is
  * the probe side of a broadcast equi-join on rowkey, Spark
  * materializes the build side, hands its key set to the scan, and the
  * scan re-plans to ONLY the probed keys' regions and digests — the
  * HBase batched-GET idiom (a join against the store is point reads,
  * not a table scan). */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("runtime-filter-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def k(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("a broadcast join on rowkey plans the scan as point reads (runtime filter applied)") {
    val root = Files.createTempDirectory("rtf").toString
    val s = spark; import s.implicits._
    BulkLoad.writeCells(
      (0 until 500).map(i => ("t", k(f"row-$i%04d"), 1L, k(s"b-$i")))
        .toDF("tableName", "rowkey", "version", "body"), root)
    val cells = spark.read.format("graft-cells")
      .option("root", root).option("table", "t").load()
    // build side: small, with a SURVIVING selective predicate (the DPP
    // trigger — a local Seq would constant-fold its filter away)
    val dim = spark.range(0, 500)
      .filter(col("id") % 100 === 7)
      .select(expr("cast(concat('row-', lpad(cast(id as string), 4, '0')) as binary)").as("key"))
    val joined = cells.join(broadcast(dim), col("rowkey") === col("key"))
      .select(col("rowkey"), col("version"), col("body"))
    val plan = joined.queryExecution.executedPlan.toString
    info(plan.linesIterator.filter(_.contains("BatchScan")).mkString("\n"))
    assert(plan.contains("dynamicpruning"),
      s"the scan must carry a runtime filter; plan:\n$plan")
    CellsSource.filesOpened.set(0)
    val ir0 = CellSegment.indexReads.get()
    val got = joined.collect()
    assert(got.length == 5)
    val opened = CellsSource.filesOpened.get()
    assert(opened <= 6, s"runtime-filtered join must open ~the probed cells, opened=$opened")
  }
}
