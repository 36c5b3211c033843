package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read face of the versioned-cell sink. The sink keeps FULL version
  * history per rowkey (the reference's maxVersions = Int.MAX_VALUE,
  * HbaseClient.kt:86-87), which makes three read shapes meaningful:
  *
  *  - [[scan]] — every cell version (audit/history reads)
  *  - [[latest]] — newest version per key (the common serving read)
  *  - [[asOf]] — newest version per key at-or-before a timestamp
  *    (time travel: what did the table look like at T?)
  *
  * Scale shape: the sink is parquet partitioned by tableName, so every
  * read prunes to one directory; latest/asOf are a max_by aggregation
  * on (tableName, rowkey) — a true partial aggregate (map-side combine
  * reduces each scan partition to one candidate per key before the
  * single shuffle), where a window rank would sort whole keys in
  * single tasks.
  */
object CellTable {

  def scan(spark: SparkSession, sinkDir: String, tableName: String): DataFrame =
    spark.read.parquet(sinkDir).filter(col("tableName") === tableName)

  def latest(spark: SparkSession, sinkDir: String, tableName: String): DataFrame =
    newestPerKey(scan(spark, sinkDir, tableName))

  def asOf(spark: SparkSession, sinkDir: String, tableName: String, asOfVersion: Long): DataFrame =
    newestPerKey(scan(spark, sinkDir, tableName).filter(col("version") <= asOfVersion))

  // F5 guarantees (tableName, rowkey, version) uniqueness, so max_by on
  // version is deterministic.
  private def newestPerKey(cells: DataFrame): DataFrame =
    cells.groupBy(col("tableName"), col("rowkey"))
      .agg(max_by(struct(col("version"), col("body")), col("version")).as("m"))
      .select(col("tableName"), col("rowkey"),
        col("m.version").as("version"), col("m.body").as("body"))
}
