package graft.queries

import graft.operators.ZOrder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-management operators: multi-dimensional Z-order clustering
  * (the `OPTIMIZE ZORDER BY` layout step) and ANALYZE-style column
  * profiling (the stats a cost-based optimizer feeds on). Both
  * integer-exact against DuckDB.
  */
object TableOps {

  private val ZBits = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-order value per order over (customer bucket, order-day bucket):
    // the Morton interleave that drives the layout in
    // ZOrder.repartitionByZ. The gate row checks the bit arithmetic
    // exactly (the SQL oracle is GENERATED from the same template as
    // the Column expression); the locality payoff — a box predicate
    // touching few range partitions — is asserted in ZOrderSpec, since
    // partition-touch counts are invisible to a SQL oracle. Narrow map.
    "q69_zorder" -> { (s, d) =>
      // o_orderdate is TIMESTAMP_NTZ in the parquet; with the session in
      // UTC the cast makes its wall-clock the instant, which is exactly
      // what DuckDB's epoch_us does with its (naive) TIMESTAMP
      val x = pmod(col("o_custkey"), lit(256L))
      val y = pmod(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"), lit(256L))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          x.as("xb"), y.as("yb"),
          ZOrder.zValue(x, y, ZBits).as("zval"))
    },

    // ANALYZE-style table profile of lineitem's numeric columns: row
    // count, nulls, exact NDV, and decimal-routed min/max per column,
    // one output row per column. Single-pass multi-aggregate (Spark
    // plans count(DISTINCT a), count(DISTINCT b), ... as one Expand +
    // partial aggregate — the data is read once), then unpivoted to
    // the long (column, stats) shape the catalog stores.
    "q70_profile" -> { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"n_$c"),
          countDistinct(col(c)).as(s"ndv_$c"),
          min((col(c).cast("decimal(18,2)") * 100).cast("long")).as(s"min_$c"),
          max((col(c).cast("decimal(18,2)") * 100).cast("long")).as(s"max_$c"))
      }
      val wide = Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
      // stack takes FLAT args (k rows of 6), not row tuples
      val stacked = cols.map(c =>
        s"'$c', n_rows, n_$c, ndv_$c, min_$c, max_$c").mkString(", ")
      wide.selectExpr(
        s"stack(${cols.length}, $stacked) AS (col_name, n_rows, n_non_null, ndv, min_x100, max_x100)")
    }
  )

  val oracle: Map[String, String] = Map(

    "q69_zorder" -> {
      val z = ZOrder.zValueSql("xb", "yb", ZBits)
      s"""WITH t AS (
           SELECT o_orderkey,
             o_custkey % 256 AS xb,
             (epoch_us(o_orderdate) // 86400000000) % 256 AS yb
           FROM orders)
         SELECT o_orderkey, xb, yb, CAST($z AS BIGINT) AS zval FROM t"""
    },

    "q70_profile" -> {
      val per = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name,
             count(*) AS n_rows,
             count($c) AS n_non_null,
             count(DISTINCT $c) AS ndv,
             CAST(min(CAST($c AS DECIMAL(18,2)) * 100) AS BIGINT) AS min_x100,
             CAST(max(CAST($c AS DECIMAL(18,2)) * 100) AS BIGINT) AS max_x100
           FROM lineitem"""
      }
      per.mkString(" UNION ALL ")
    }
  )
}
