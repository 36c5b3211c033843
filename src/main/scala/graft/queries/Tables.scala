package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (repo:TESTDATA.md).
  * One parquet file per table under `/root/testdata/sf*`/.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark reads only as a
    * nanos Long (spark.sql.legacy.parquet.nanosAsLong=true); normalize
    * to a microsecond TimestampType column here.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.withColumn("ts", tsAsTimestamp(raw))
  }

  /** The raw events `ts` as a microsecond TimestampType column,
    * whichever way the parquet encoded it: TIMESTAMP(NANOS) surfaces
    * as a nanos LONG under nanosAsLong=true (the driver files);
    * standard MICROS/MILLIS parquet surfaces as TimestampType
    * directly. Works on batch AND streaming frames — the streaming
    * queries must not assume the exotic nanos encoding. */
  def tsAsTimestamp(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (df.schema("ts").dataType == LongType) timestamp_micros(expr("ts div 1000"))
    // micros/millis parquet reads as TIMESTAMP or (isAdjustedToUTC=0)
    // TIMESTAMP_NTZ; with the session pinned to UTC the cast makes the
    // NTZ wall-clock the same instant (the q69 convention)
    else col("ts").cast("timestamp")
  }

  /** The raw events `ts` as epoch millis (long), either encoding. */
  def tsAsMillis(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    if (df.schema("ts").dataType == LongType) expr("ts div 1000000")
    else unix_millis(col("ts").cast("timestamp"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Round-robin fan-out to the session's shuffle parallelism. The
    * driver tables are ONE parquet file each, so the scan is one input
    * split — and every row of generate-heavy work (shingling, window
    * hashing, signature building) scheduled BEFORE the first exchange
    * would run on a single core (measured 2.5 s → 0.56 s on the q111
    * window aggregate). The repartition shuffles only the skinny
    * source rows, far cheaper than serializing the expansion. At
    * cluster scale a real table has thousands of splits and this
    * becomes a cheap no-op by comparison — the operator shapes
    * themselves are unchanged (all downstream results are
    * partitioning-independent by the repo's determinism discipline).
    * Use it ONLY where the pre-exchange expansion dominates: A/B
    * benching showed q111 4× faster and MinHash signatures ~20%
    * faster, but q16/q17/q51 neutral-to-slower — their heavy stages
    * already sit behind an exchange, so the extra shuffle is pure
    * overhead there. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
}
