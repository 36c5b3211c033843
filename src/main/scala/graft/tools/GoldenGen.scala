package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the in-repo golden parquets that anchor oracle rows whose
  * values DuckDB cannot recompute (no crc32 / rolling-hash functions).
  *
  * Usage: `runMain graft.tools.GoldenGen <sfDir> <outDir>` — e.g.
  * `runMain graft.tools.GoldenGen /root/testdata/sf0.01 testdata/q38_golden`.
  *
  * The golden freezes ONLY the columns DuckDB can't derive (q38:
  * media_id, checksum, feature_fp); everything else in the oracle is
  * computed analytically by DuckDB from the source parquet, and the
  * frozen semantics are pinned independently by MediaSpec's
  * hand-computed expectations — so a regression in the byte path can't
  * hide behind a stale golden without also failing the unit suite.
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: GoldenGen <sfDir> <outDir>")
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-golden-gen")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.MediaVerify.features(spark, sfDir)
      .select("media_id", "checksum", "feature_fp")
      .coalesce(1)
      .write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
