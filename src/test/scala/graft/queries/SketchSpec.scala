package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Bounds the sketch operators' error against exact computations —
  * the verification an estimate-producing operator gets instead of a
  * hash-equal oracle. */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("sketch-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("HLL distinct estimates land within 5% of exact per group") {
    val approx = SparkEntry.queries("q29_sketches")(spark, sf)
      .select(col("event_type"), col("approx_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$k: approx $a vs exact $n")
    }
  }

  test("approx quantiles fall between neighboring exact quantiles") {
    val approx = SparkEntry.queries("q29_sketches")(spark, sf)
      .select(col("event_type"), col("approx_median_value"), col("approx_p99_value")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    approx.foreach { case (k, (median, p99)) =>
      val Array(lo45, hi55, lo975) = Tables.events(spark, sf)
        .filter(col("event_type") === k)
        .stat.approxQuantile("value", Array(0.45, 0.55, 0.975), 0.0) // 0.0 = exact
      assert(median >= lo45 && median <= hi55, s"$k median $median outside [$lo45, $hi55]")
      assert(p99 >= lo975, s"$k p99 $p99 below exact p97.5 $lo975")
    }
  }
}
