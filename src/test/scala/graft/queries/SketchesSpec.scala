package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The deterministic sketches (q137-q139) beyond the hash gate: the
  * estimates must actually ESTIMATE (error inside the family's
  * theoretical bounds on real data), and the sketch state must be
  * MERGEABLE — the property that makes a sketch a distributed operator
  * rather than a curiosity (partial aggregation IS a merge). */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("sketches-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q137: raw HLL estimate lands within 3σ (m=32 → ±55%) of exact in the raw regime") {
    // sf0.01: n_exact = 150 per type ≥ 2.5m = 80, the raw estimator's
    // home regime (the query deliberately ships the RAW formula — no
    // float linear-counting branch, engine-portable by construction —
    // and documents the low-range bias)
    val rows = SparkEntry.queries("q137_hll_sketch")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("est")
      assert(exact >= 80, s"fixture left the raw regime: $exact")
      assert(math.abs(est - exact) <= (exact * 55) / 100,
        s"${r.getString(0)}: est $est vs exact $exact")
      assert(r.getAs[Long]("nreg") <= 32)
    }
    // below the raw regime (sf0.001: n = 15) the raw formula's known
    // positive bias stays bounded by the α·m ceiling
    SparkEntry.queries("q137_hll_sketch")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("est") <= 3L * 32, r.toString)
    }
  }

  test("q137: the register sketch is mergeable — max-merge of halves equals the whole") {
    // re-derive (event_type, idx, rank) with the query's own hash
    // construction, split by user parity, and check elementwise-max of
    // the halves' registers equals the full registers — partial
    // aggregation on max IS the HLL merge, so a 1000-executor rollup is
    // exact by this property.
    val h = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .withColumn("idx", col("h") % 32)
      .withColumn("rank", least(lit(56) - length(bin(expr("h div 32"))), lit(40)))
    def regs(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Int] =
      df.groupBy(col("event_type"), col("idx")).agg(max(col("rank")).as("m"))
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getInt(2))).toMap
    val whole = regs(h)
    val a = regs(h.filter(col("user_id") % 2 === 0))
    val b = regs(h.filter(col("user_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map { k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))
    }.toMap
    assert(merged == whole)
  }

  test("hll_registers (native aggregate) equals the relational groupBy(idx).max derivation") {
    val sp = spark; import sp.implicits._
    graft.functions.GraftFunctions.register(spark)
    val vals = (1 to 500).map(i => ("g" + (i % 3), (i * 2654435761L) & ((1L << 60) - 1)))
    val df = vals.toDF("g", "h")
    val native = df.groupBy(col("g"))
      .agg(expr("hll_registers(h)").as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toVector).toMap
    val relational = df
      .withColumn("idx", col("h") % 32)
      .withColumn("rank", least(lit(56) - length(bin(expr("h div 32"))), lit(40)))
      .groupBy(col("g"), col("idx")).agg(max(col("rank")).as("m"))
      .collect().groupBy(_.getString(0)).map { case (g, rows) =>
        val regs = Array.fill(32)(0)
        rows.foreach(r => regs(r.getLong(1).toInt) = r.getInt(2))
        g -> regs.toVector
      }
    assert(native == relational)
  }

  test("q138: KMV estimate is exact below k and within ±20% (3σ for k=256) above it") {
    val rows = SparkEntry.queries("q138_kmv_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_tokens_exact")
      val est = r.getAs[Long]("est")
      val skSize = r.getAs[Long]("sk_size")
      if (skSize < 256)
        // degenerate regime: the sketch saw every hash — est counts
        // distinct TRUNCATED hashes, so allow only collision slack
        assert(exact - est <= math.max(2L, exact / 50) && est <= exact,
          s"${r.getString(0)}: degenerate est $est vs exact $exact")
      else
        assert(math.abs(est - exact) <= (exact * 20) / 100,
          s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("q144: count-min is one-sided and tight — est ≥ exact, overshoot within the CM bound") {
    val rows = SparkEntry.queries("q144_countmin")(spark, sf).collect()
    assert(rows.length == 20)
    val n = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("c_exact")
      val est = r.getAs[Long]("c_est")
      assert(est >= exact, s"${r.getAs[String]("token")}: CM must never undercount ($est < $exact)")
      // standard CM guarantee: overshoot ≤ 2N/w with prob 1-2^-d per
      // probe; gate at 4N/w for slack on a fixed corpus
      assert(est - exact <= math.max(5L, 4L * n / 512),
        s"${r.getAs[String]("token")}: overshoot ${est - exact} vs N=$n")
    }
  }

  test("q144: the counter table is mergeable by addition — sum-merge of halves equals the whole") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    def cm(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      df.groupBy(col("t")).agg(count(lit(1)).as("c"))
        .select(col("t"), col("c"), explode(sequence(lit(0), lit(3))).as("r"))
        .withColumn("b", expr(
          "CAST(conv(substring(md5(concat(CAST(r AS STRING), ':', t)), 1, 15), 16, 10) AS BIGINT) % 512"))
        .groupBy(col("r"), col("b")).agg(sum(col("c")).as("cnt"))
        .collect().map(x => ((x.getInt(0), x.getLong(1)), x.getLong(2))).toMap
    val whole = cm(toks)
    val a = cm(toks.filter(col("doc_id") % 2 === 0))
    val b = cm(toks.filter(col("doc_id") % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("q139: KMV Jaccard tracks exact vocabulary Jaccard within ±0.2 on every pair") {
    val toks = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).distinct()
    val bySrc = toks.collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getString(1)).toSet }
    val got = SparkEntry.queries("q139_kmv_jaccard")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (bySrc(a), bySrc(b))
      val exact = (sa & sb).size.toDouble / (sa | sb).size
      val est = r.getAs[Long]("jacc_x1000") / 1000.0
      assert(math.abs(est - exact) <= 0.2, s"($a,$b): est $est vs exact $exact")
    }
  }
}
