package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * read prunes to one directory; latest/asOf are one shuffle on rowkey
  * (a window rank, partial-aggregable to top-1 per key by AQE).
  */
object CellTable {

  def scan(spark: SparkSession, sinkDir: String, tableName: String): DataFrame =
    spark.read.parquet(sinkDir).filter(col("tableName") === tableName)

  def latest(spark: SparkSession, sinkDir: String, tableName: String): DataFrame =
    newestPerKey(scan(spark, sinkDir, tableName))

  def asOf(spark: SparkSession, sinkDir: String, tableName: String, asOfVersion: Long): DataFrame =
    newestPerKey(scan(spark, sinkDir, tableName).filter(col("version") <= asOfVersion))

  private def newestPerKey(cells: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("rowkey")).orderBy(col("version").desc)
    cells.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
