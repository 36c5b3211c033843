package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan hygiene: the properties that decide whether these
  * queries survive a 100× scale-up. Checked against the real optimized
  * plans, not intentions: predicate pushdown reaches the parquet scan,
  * column pruning shrinks ReadSchema, bounded dims broadcast, unbounded
  * sides do not, and scans stay inside whole-stage codegen. */
class PlanHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("plan-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(q: String): SparkPlan =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan

  private def formatted(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02: range + value predicates are pushed into the parquet scan") {
    val s = formatted("q02_filter_pushdown")
    assert(s.contains("PushedFilters"), s)
    val pushed = s.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") && pushed.contains("l_quantity"), pushed)
  }

  test("q02: column pruning — ReadSchema carries only referenced columns") {
    val s = formatted("q02_filter_pushdown")
    val read = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"), read)
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"), read)
  }

  test("q05: bounded dims (nation, region) broadcast; fact-side joins shuffle") {
    val s = plan("q05_multi_join").toString
    assert(s.contains("BroadcastHashJoin"), "expected broadcast joins for nation/region")
    // lineitem⋈orders must NOT be a broadcast of lineitem (unbounded):
    // at tiny SF AQE may broadcast orders, but lineitem stays probe side
    assert(!s.contains("CartesianProduct"), "no accidental cross join")
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val s = formatted("q01_pricing_summary")
    val aggs = s.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.size >= 2, s"expected partial+final HashAggregate pair:\n$aggs")
  }

  test("global sweep: no cartesian/nested-loop join anywhere in the full query surface") {
    // The only sanctioned cross joins are the bounded-by-construction
    // query-side broadcasts in the ANN scorers (|Q| = 5 probe vectors /
    // nlist centroids) — everything else going cartesian is a planning
    // regression that would explode at scale.
    val sanctioned = Set("q18_ann_bruteforce", "q19_ann_lsh", "q19b_ann_ivf",
      "q159_ann_pq",
      "q115_hard_negatives", // |Q| = 50 probes broadcast — bounded by construction
      "q172_ks_test",     // dense ECDF grid: |distinct values| × |sources|, both value-domain bounded
      "q186_mannwhitney", // the same shared dense ECDF grid as q172
      "q173_chi_square",  // contingency grid: R marginals × C marginals (types × 7 dows)
      "q178_rrf_fusion",  // the 1-row query vector broadcasts against the corpus (q18's shape)
      "q180_ccf",         // the 1-row reference-denominator scalar broadcasts
      "q183_hll_intersect") // |types|² sketch pairs — corpus-independent
    val failures = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(sanctioned)
      .flatMap { q =>
        val df = SparkEntry.queries(q)(spark, sf)
        df.collect()
        val s = df.queryExecution.executedPlan.toString
        if (s.contains("CartesianProduct") || s.contains("BroadcastNestedLoopJoin"))
          Some(q)
        else None
      }
    assert(failures.isEmpty, s"cartesian/nested-loop in: $failures")
  }

  test("q49: bucketed join reads bucket-aligned scans with no exchange on the join keys") {
    val df = SparkEntry.queries("q49_bucketed_join")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("SortMergeJoin"), s)
    assert(s.contains("Bucketed: true"), s)
    // the only allowed exchange is the post-join groupBy on c_mktsegment
    assert(!s.contains("hashpartitioning(o_custkey") && !s.contains("hashpartitioning(c_custkey"), s)
  }

  test("q50: date range prunes partition directories at the scan") {
    val df = SparkEntry.queries("q50_partition_prune")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val scanLine = s.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("event_date"), s)
    // the range predicate must be a partition filter, not a data filter
    // over a full scan
    assert(!scanLine.contains("PartitionFilters: []"), scanLine)
  }

  test("q55: mixing keep-decision is a pure narrow map — zero exchanges") {
    val df = SparkEntry.queries("q55_data_mix")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
  }

  test("q41: split assignment is a pure narrow map — zero exchanges") {
    val df = SparkEntry.queries("q41_split")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
  }

  test("q126: redaction is a pure narrow map — zero exchanges") {
    val df = SparkEntry.queries("q126_pii_redact")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
  }

  test("q131: the encode stage is a pure narrow map — merges ride inside the expression") {
    val df = SparkEntry.queries("q131_bpe_encode")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
  }

  test("q135: winnowing selection is a pure narrow map — zero exchanges") {
    val df = SparkEntry.queries("q135_winnowing")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
  }

  test("q130: the exact median never sorts whole-source ROWS through a window") {
    // the median must come from the (source, n_chars, count) aggregate —
    // value-domain cardinality — not a row_number over every row of a
    // source (one task sorts a whole source at scale). Pin: no window in
    // the plan orders by the per-row tiebreak column; every window runs
    // over post-aggregate columns only.
    val df = SparkEntry.queries("q130_dataset_card")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val rowScaleWindows = s.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("doc_id"))
      .toSeq
    assert(rowScaleWindows.isEmpty, s"whole-source row window(s):\n${rowScaleWindows.mkString("\n")}")
  }

  test("q137: HLL registers reduce with a partial/final aggregate pair (the sketch merge)") {
    val df = SparkEntry.queries("q137_hll_sketch")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // max-per-register must partial-aggregate map-side — that partial
    // IS the distributed HLL merge the spec proves correct
    assert(s.linesIterator.count(_.contains("HashAggregate")) >= 2, s)
  }

  test("q138: the KMV bottom-k is a map-side group limit, never a whole-group sort") {
    val df = SparkEntry.queries("q138_kmv_distinct")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit"), s"constant-k rank filter must plant a group limit:\n$s")
  }

  test("q148: subtree rollup is expansion + ONE aggregate — no join, no iteration") {
    val df = SparkEntry.queries("q148_tree_rollup")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Join"), s"ancestor expansion must not join:\n$s")
    assert(s.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregate pair:\n$s")
  }

  test("q129: the bounded target vocabulary broadcasts into the scoring join") {
    val df = SparkEntry.queries("q129_domain_select")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"top-30 vocab must broadcast:\n$s")
  }

  test("q42: keeper join broadcasts (dedup keepers are id-sized, never a sort-merge)") {
    val df = SparkEntry.queries("q42_clean_corpus")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q08: rank filter plants a map-side WindowGroupLimit before the shuffle") {
    val df = SparkEntry.queries("q08_window")(spark, sf)
    df.collect() // AQE: final plan only after execution
    val s = df.queryExecution.executedPlan.toString
    // Partial = per input partition BEFORE the exchange: the shuffle
    // carries ~3·|keys| rows, not the table. Both modes must be present.
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"), s)
    assert(s.contains("Final"), s)
  }

  test("q14: md5 grouping runs inside whole-stage codegen") {
    val df = SparkEntry.queries("q14_dedup_exact")(spark, sf)
    df.collect() // finalize the AQE plan — codegen spans appear post-execution
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("WholeStageCodegen") || s.contains("*("), s)
  }

  test("events scan: q12 only reads the columns it needs") {
    val s = formatted("q12_events_hourly")
    val read = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("payload") || read.nonEmpty) // schema-dependent; must at least prune
    assert(read.contains("event_type"), read)
  }

  test("q24: no join keyed solely on the low-cardinality label — bucket axes are join keys") {
    val df = SparkEntry.queries("q24_dedup_embedding")(spark, sf)
    df.collect() // finalize AQE (join nodes sit inside the adaptive plan)
    val s = df.queryExecution.executedPlan.toString
    val joinLines = s.linesIterator.filter(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin")).toSeq
    assert(joinLines.nonEmpty, s"expected an equi-join in q24:\n$s")
    val bucketKey = ".*\\bb[ab]#\\d+.*".r
    joinLines.filter(_.contains("label#")).foreach { l =>
      assert(bucketKey.matches(l),
        s"q24 join keyed without the bucket axes (parallelism ceiling = |label|): $l")
    }
  }

  test("q17: the shingle index explodes a position sequence, not a HOF-built array") {
    val s = formatted("q17_ngram_jaccard")
    // the Generate's generator must be the codegen-friendly sequence —
    // exploding transform()/array_distinct() re-evaluates those
    // CodegenFallback HOFs per OUTPUT row (measured ~5 s at sf0.1)
    val gen = s.linesIterator.filter(l => l.contains("Generate") || l.contains("explode")).mkString("\n")
    assert(gen.contains("sequence"), s"q17 Generate is not over a position sequence:\n$gen")
    assert(!gen.contains("array_distinct") && !gen.contains("transform("),
      s"q17 explodes a HOF-built array (CodegenFallback inside Generate):\n$gen")
  }

  test("q32: as-of join plans as window-over-union — no join node, one exchange tree") {
    val df = SparkEntry.queries("q32_asof_join")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Join"), s"q32 should have no join node (range explosion risk):\n$s")
    assert(s.contains("Window"), s)
  }

  test("q33: the interval join is an equi-join on bucket id, never a nested loop") {
    val df = SparkEntry.queries("q33_range_join")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"q33 fell back to a nested loop (O(|L|·|R|) at scale):\n$s")
  }

  test("q35/q36: aggregates are partial (map-side combine) before the shuffle") {
    Seq("q35_percentiles", "q36_cube").foreach { q =>
      val s = plan(q).toString
      assert(s.contains("partial"), s"$q has no partial aggregate:\n$s")
    }
  }

  test("q34: per-doc top-k window partitions on the high-cardinality doc_id") {
    val df = SparkEntry.queries("q34_tfidf_topk")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val windowLines = s.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(windowLines.contains("doc_id"),
      s"q34 window not partitioned by doc_id:\n$windowLines")
  }

  test("q57/q59/q62/q64: corpus rule/scrub/quantize/normalize queries are pure narrow maps — zero exchanges") {
    Seq("q57_gopher_rules", "q59_pii_scrub", "q62_quantize", "q64_normalize").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("Exchange"), s"$q shuffles a shuffle-free operator:\n$s")
    }
  }

  test("q60: chunking explodes an integer sequence (no HOF inside the Generate), zero exchanges") {
    val df = SparkEntry.queries("q60_chunk")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
    val gen = s.linesIterator.filter(_.contains("Generate")).mkString("\n")
    assert(gen.contains("sequence"), s"q60 Generate is not over a position sequence:\n$gen")
    assert(!gen.contains("transform("), s"q60 explodes a HOF-built array:\n$gen")
  }

  test("q58: ONE range shuffle of the data — counts branch reuses the exchange, offsets broadcast") {
    val df = SparkEntry.queries("q58_global_rank")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("rangepartitioning"), s)
    assert(s.contains("ReusedExchange"), s"q58 counts branch re-shuffles the data:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"q58 offsets must broadcast, not sort-merge:\n$s")
    assert(!s.contains("SortMergeJoin"), s)
    // the big side is range-partitioned exactly once in the FINAL plan
    // (ReusedExchange echoes the node's description; Initial Plan shows
    // the pre-reuse shape — exclude both)
    val finalPlan = s.split("== Initial Plan ==")(0)
    assert(finalPlan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange")) == 1, finalPlan)
  }

  test("q63: histogram reuses the rank exchange; count joins in as a broadcast hash join") {
    val df = SparkEntry.queries("q63_equidepth")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("ReusedExchange"), s)
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q71: the stratum sampler plants a map-side WindowGroupLimit before the shuffle") {
    val df = SparkEntry.queries("q71_eval_sample")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"), s)
  }

  test("q72: the FK audit's own plan equi-joins each edge — no nested loop, no collect") {
    val df = SparkEntry.queries("q72_fk_audit")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("LeftOuter"), s)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    assert(!s.contains("LocalTableScan"), s"audit rows must come from the join, not the driver:\n$s")
  }

  test("q65: the snapshot diff is a FULL OUTER shuffle join on the uniform id key") {
    val df = SparkEntry.queries("q65_snapshot_diff")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("FullOuter"), s)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q61: vocabulary joins back via broadcast; both aggregations are partial") {
    val df = SparkEntry.queries("q61_unigram_lm")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
    assert(s.contains("partial_count"), s)
  }

  test("q73: MERGE plans as one hash shuffle on the key — no join node anywhere") {
    val df = SparkEntry.queries("q73_merge_upsert")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Join"), s"q73 must merge via union+agg, not a join:\n$s")
    val finalPlan = s.split("== Initial Plan ==")(0)
    assert(finalPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")) == 1,
      s"q73 must shuffle exactly once:\n$finalPlan")
    assert(s.contains("partial_max_by") || s.contains("Partial"), s)
  }

  test("q76: the heavy input collapses in a partial aggregate before the dense-domain join") {
    val df = SparkEntry.queries("q76_gap_fill")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("partial_count"), s"q76 counts aggregate not partial:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"the types×hours domain must build via hash joins only:\n$s")
  }

  test("q77: the rolling window partitions on the uniform customer key") {
    val df = SparkEntry.queries("q77_rolling")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val windowLines = s.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(windowLines.contains("o_custkey"), s"q77 window not keyed on o_custkey:\n$windowLines")
    assert(!s.contains("SinglePartition"), s"q77 must never sort globally:\n$s")
  }

  test("q78/q80: sliding-window and partial-merge aggregates are map-side partial") {
    Seq("q78_sliding_window", "q80_incremental_agg").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("partial_count"), s"$q aggregate not partial:\n$s")
      assert(!s.contains("CartesianProduct") && !s.contains("ScalaUDF"), s)
    }
  }

  test("q74: the bloom probe filters the fact scan BEFORE the shuffle; the join stays exact") {
    val df = SparkEntry.queries("q74_bloom_join")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("bloom_might_contain"), s"bloom probe missing:\n$s")
    assert(s.contains("LeftSemi"), s"exact semi join missing (bloom must not decide):\n$s")
    // the probe sits in the scan stage: in the FINAL plan (parents print
    // above children) the fact FileScan must follow the bloom filter
    // line with no Exchange between them
    val lines = s.split("== Initial Plan ==").head.linesIterator.toSeq
    val bloomIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("bloom_might_contain(l_orderkey"))
    assert(bloomIdx >= 0, s"no bloom Filter on the fact key:\n$s")
    val below = lines.drop(bloomIdx)
      .takeWhile(l => !(l.contains("FileScan parquet") && l.contains("lineitem")))
    assert(!below.exists(_.contains("Exchange")),
      s"bloom probe must run directly on the fact scan, below any shuffle:\n$s")
    assert(!s.contains("ScalaUDF"), s)
  }

  test("q75: hot keys broadcast, cold keys shuffle — both join flavors in one plan") {
    // simulate the scale condition (dim too big to broadcast) so the
    // cold slice takes the shuffle join it would take at 100 TB; the
    // hot slice's explicit broadcast() hint must survive regardless
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q75_skew_join")(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("BroadcastHashJoin"), s"hot slice must broadcast:\n$s")
      assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin"),
        s"cold slice must stay a shuffle join:\n$s")
      assert(s.contains("Union"), s)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q79: percentile bounds broadcast back — the row stream never shuffles") {
    val df = SparkEntry.queries("q79_winsorize")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"bounds must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s"row stream must not shuffle for the clamp join:\n$s")
  }

  test("q81: grouped concatenation aggregates partially (map-side collect)") {
    val df = SparkEntry.queries("q81_group_concat")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("partial_collect_list") || s.contains("partial_"), s)
    assert(!s.contains("ScalaUDF"), s)
  }

  test("q82: the bounded top-k aggregate is partial — the shuffle carries k-long heaps, not rows") {
    val df = SparkEntry.queries("q82_topk_agg")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("partial_topk_longs"), s"topk aggregate must have a map-side partial:\n$s")
    assert(s.contains("ObjectHashAggregate"), s)
  }

  test("entry smoke plan has no Python/UDF eval nodes (everything codegen-able)") {
    Seq("q01_pricing_summary", "q04_join_shuffle", "q14_dedup_exact", "q21_lang_id",
        "q64_normalize").foreach { q =>
      val s = plan(q).toString
      assert(!s.contains("BatchEvalPython") && !s.contains("ScalaUDF"), s"$q contains UDF eval")
    }
  }

  test("q88: six window functions fuse into window nodes sharing ONE exchange") {
    val df = SparkEntry.queries("q88_window_suite")(spark, sf)
    df.collect()
    // AQE's toString repeats the plan under "== Initial Plan ==" —
    // count only the final section
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val nExchanges = s.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val nWindows = s.linesIterator.count(_.trim.matches("(\\+- )?Window .*"))
    assert(nExchanges == 1 && nWindows == 1,
      s"six functions must fuse into ONE Window over ONE exchange " +
        s"(got $nWindows windows, $nExchanges exchanges):\n$s")
  }

  test("q89: full outer join never broadcasts (either side may be preserved)") {
    val df = SparkEntry.queries("q89_full_outer")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val outer = s.linesIterator.filter(_.contains("FullOuter")).mkString
    assert(outer.nonEmpty, s"expected a FullOuter join:\n$s")
    assert(!outer.contains("Broadcast"), s"full outer must shuffle both sides:\n$outer")
  }

  test("q91: the fuzzy dictionary broadcasts — levenshtein never touches a fact-row join") {
    val df = SparkEntry.queries("q91_fuzzy_join")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"fuzzy name-pair dict must broadcast:\n$s")
    // levenshtein may only appear below the dictionary join (64² rows),
    // never as a post-join filter over part×part candidates
    val filterLines = s.linesIterator.filter(l => l.contains("levenshtein") && l.contains("Filter")).toSeq
    filterLines.foreach(l => assert(!l.contains("key_a"),
      s"levenshtein filtering fact-pair rows (n² at scale): $l"))
  }

  test("q93: the centroid table broadcasts back onto the exploded rows") {
    val df = SparkEntry.queries("q93_centroid_outliers")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"bounded (label,pos) centroids must broadcast:\n$s")
  }

  test("q95: unpivot is a zero-exchange narrow map") {
    val df = SparkEntry.queries("q95_unpivot")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
  }

  test("q96/q99/q100: mode, histogram and covariance aggregate partially before the shuffle") {
    Seq("q96_mode", "q99_width_histogram", "q100_covariance").foreach { q =>
      val s = plan(q).toString
      assert(s.contains("partial"), s"$q has no partial aggregate:\n$s")
    }
  }

  test("q101: candidate join keys on (band, bv, ba, bb) — sub-bucketed inside band buckets") {
    val df = SparkEntry.queries("q101_simhash_pairs")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val joinLine = s.linesIterator.filter(l =>
      l.contains("Join") && l.contains("band")).mkString
    assert(joinLine.contains("ba") && joinLine.contains("bb"),
      s"pair join must carry the (ba, bb) sub-bucket axes (hot-bucket parallelism):\n$s")
    assert(s.contains("bit_count"), s"exact hamming re-check missing:\n$s")
  }

  test("q103: global vocabulary top-k plans as TakeOrderedAndProject, never a global window sort") {
    val df = SparkEntry.queries("q103_vocab_build")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"top-k must be map-side TakeOrdered (a global sort dies at vocab scale):\n$s")
  }

  test("q104/q105/q106/q107: span keepers, bigram argmax, shard manifests, decay aggregate partially") {
    Seq("q104_span_dedup", "q105_bigram_lm", "q106_shard_manifest", "q107_decay_agg").foreach { q =>
      val s = plan(q).toString
      assert(s.contains("partial"), s"$q has no partial aggregate:\n$s")
      assert(!s.contains("CartesianProduct"), q)
    }
  }

  test("q109: the k-means assignment is a zero-shuffle narrow map (centroids ride the expression)") {
    val df = SparkEntry.queries("q109_kmeans")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"),
      s"final assignment must not shuffle (bounded centroids are plan-carried):\n$s")
    assert(s.contains("nearest_centroid_packed"), s)
  }

  test("q108: the bounded vocabulary broadcasts back onto the token stream") {
    val df = SparkEntry.queries("q108_token_ids")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"top-k vocab must broadcast:\n$s")
  }

  test("q116: collocation top-20 is TakeOrdered over partial count aggregates") {
    val df = SparkEntry.queries("q116_collocations")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"the cut must be map-side top-k, never a global sort of the bigram table:\n$s")
    assert(s.contains("partial"), s"bigram/unigram counts must combine map-side:\n$s")
  }

  test("q117: the shingle self-join shuffles by hash — an exploded side must never broadcast") {
    val df = SparkEntry.queries("q117_containment_join")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("ShuffledHashJoin"),
      s"posting-list self-join must be a shuffled hash join on shingle:\n$s")
  }

  test("q118/q119: novelty and cascade counts combine map-side (partial aggregates)") {
    Seq("q118_ngram_novelty", "q119_filter_cascade").foreach { q =>
      val s = plan(q).toString
      assert(s.contains("partial"), s"$q has no partial aggregate:\n$s")
    }
  }

  test("q121/q123: repetition and familiarity counts combine map-side (partial aggregates)") {
    Seq("q121_repetition", "q123_lm_familiarity").foreach { q =>
      val s = plan(q).toString
      assert(s.contains("partial"), s"$q has no partial aggregate:\n$s")
      assert(!s.contains("CartesianProduct"), s"$q plans a cross join:\n$s")
    }
  }

  test("q122: int8 quantization is a pure narrow map — zero exchanges in the plan") {
    val s = plan("q122_quantize_embed").toString
    assert(!s.contains("Exchange"),
      s"per-vector quantization must never shuffle:\n$s")
  }

  test("q125: the |sources| row-set broadcasts; token counts combine map-side") {
    val df = SparkEntry.queries("q125_source_drift")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"ns must broadcast:\n$s")
    assert(s.contains("partial"), s"token counts must combine map-side:\n$s")
  }

  test("q120: the ranking window runs over df aggregates, never fact rows") {
    val df = SparkEntry.queries("q120_boilerplate")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("Window"), s)
    // the window's sort key is the aggregated df column — proof the
    // per-(source,bigram) aggregate ran BEFORE the window, not after
    val wLine = s.linesIterator.filter(_.contains("Window")).mkString
    assert(wLine.contains("df"), s"window must rank aggregated df values:\n$s")
    assert(s.contains("partial"), s"df count must combine map-side:\n$s")
  }

  test("q149: per-stratum draw prunes map-side (WindowGroupLimit); quotas broadcast") {
    val df = SparkEntry.queries("q149_stratified_sample")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // the literal rn <= B filter is what plants the group limit — the
    // residual rn <= quota predicate alone would sort whole strata
    assert(s.contains("WindowGroupLimit"), s"stratum draw must prune map-side:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"the bounded quota table must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q150/q151: release-gate aggregates combine map-side (partial pairs)") {
    Seq("q150_l_diversity", "q151_dp_release").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("partial"), s"$q must combine map-side:\n$s")
      assert(!s.contains("Join"), s"$q is aggregate-only — no join belongs in the plan:\n$s")
    }
  }

  test("q152: the moments sketch is ONE partial-aggregable exchange; stats ride the bounded table") {
    val df = SparkEntry.queries("q152_moments")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("partial"), s"power sums must combine map-side (the sketch merge):\n$s")
    val finalPlan = s.split("== Initial Plan ==")(0)
    assert(finalPlan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange") &&
        !l.contains("BroadcastExchange")) == 1,
      s"one corpus pass means exactly one exchange:\n$finalPlan")
  }

  test("q154: top-20 plans as TakeOrdered; the |Q|-row idf table broadcasts") {
    val df = SparkEntry.queries("q154_bm25")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrdered"), s"BM25 top-k must never globally sort:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"the 4-row idf table must broadcast:\n$s")
    assert(s.contains("partial"), s"tf/dl counts must combine map-side:\n$s")
  }

  test("q155: the weighted draw is a narrow map into TakeOrdered — no shuffle of the corpus") {
    val df = SparkEntry.queries("q155_weighted_sample")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrdered"), s"weighted bottom-k must plan as TakeOrdered:\n$s")
    assert(!s.contains("Exchange hashpartitioning") && !s.contains("Exchange rangepartitioning"),
      s"the corpus must not shuffle for a constant-k draw:\n$s")
  }

  test("q166: attribution plans as window-over-union — no join node touches the event stream") {
    val df = SparkEntry.queries("q166_attribution")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Join"), s"the as-of pick must be a window, not a join:\n$s")
    assert(s.contains("Window"), s)
  }

  test("q165: the Gini rank reuses ONE range exchange; deciles ride the rank output") {
    val df = SparkEntry.queries("q165_gini")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    assert(s.contains("partial"), s"spend/decile aggregates must combine map-side:\n$s")
  }

  test("q163: basket pairs ride the bounded order-key self-join; counts combine map-side") {
    val df = SparkEntry.queries("q163_assoc_rules")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"pair generation must equi-join on the order key:\n$s")
    assert(s.contains("partial"), s"item/pair supports must combine map-side:\n$s")
  }

  test("q164: grouping sets plan as ONE Expand + partial aggregate, no repeated scans") {
    val df = SparkEntry.queries("q164_grouping_sets")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("Expand"), s"grouping sets must Expand, not union scans:\n$s")
    assert(s.contains("partial"), s"the multi-level aggregate must combine map-side:\n$s")
    val finalPlan = s.split("== Initial Plan ==")(0)
    assert(finalPlan.linesIterator.count(_.contains("FileScan")) <= 1,
      s"one pass over the data:\n$finalPlan")
  }

  test("q162: the OLS fit is ONE partial-aggregable moment pass — no join, no second scan") {
    val df = SparkEntry.queries("q162_linfit")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("partial"), s"moment sums must combine map-side:\n$s")
    assert(!s.contains("Join"), s"fit arithmetic must ride the aggregate output:\n$s")
    val finalPlan = s.split("== Initial Plan ==")(0)
    assert(finalPlan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange") &&
        !l.contains("BroadcastExchange")) == 1,
      s"one moment pass means exactly one exchange:\n$finalPlan")
  }

  test("q160: both medians ride value-domain aggregates; med/mad broadcast back") {
    val df = SparkEntry.queries("q160_mad_outliers")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // the cumulative windows must consume (source, value, cnt)
    // AGGREGATE rows, never raw documents — the q130 median discipline
    val wLines = s.linesIterator.filter(l => l.contains("Window") && l.contains("cum")).toSeq
    assert(wLines.nonEmpty && wLines.forall(_.contains("cnt")),
      s"median windows must run over value-domain counts:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"med/mad tables must broadcast:\n$s")
    assert(s.contains("partial"), s"value counts must combine map-side:\n$s")
  }

  test("q157: skyline thresholds broadcast; dominance never self-joins the fact table") {
    val df = SparkEntry.queries("q157_skyline")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"the bounded date-max thresholds must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastNestedLoopJoin"),
      s"skyline must not plan a dominance self-join:\n$s")
    assert(s.contains("partial"), s"the date-max rollup must combine map-side:\n$s")
  }

  test("q158: the sweep's data window partitions on (type, day); carries broadcast back") {
    val df = SparkEntry.queries("q158_concurrency")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // the corpus-scale running sum must ride the high-cardinality
    // (event_type, day) partitioning — a per-type-only window would
    // funnel each type through one task
    val wLines = s.linesIterator.filter(l => l.contains("Window") && l.contains("run_local")).mkString
    assert(wLines.contains("day"), s"local sweep must partition by (type, day):\n$s")
    assert(s.contains("BroadcastHashJoin"), s"day carry-ins must broadcast:\n$s")
  }

  test("q153: every triangle join is an equi-hash join on node keys — no nested loop") {
    // materialize the component frames the query builds internally by
    // running it; then re-derive the wedge join's plan shape
    val df = SparkEntry.queries("q153_triangles")(spark, sf)
    val out = df.collect()
    assert(out.length == 1)
    // plan checks run on the inner pipeline: rebuild the oriented-edge
    // join exactly as the query does and inspect ITS plan (the final
    // 1-row literal select hides the interesting operators)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val e = li.as("a").join(li.as("b"),
      col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    val s = e.queryExecution.executedPlan.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"edge build must equi-join on the order key:\n$s")
  }

  test("q171: both rank maps broadcast back to the fact rows") {
    val df = SparkEntry.queries("q171_spearman")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // two broadcast hash joins (rx2 on (source, x), ry2 on (source, y))
    // — the data-sized side must never shuffle for the rank attach
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 2,
      s"rank maps must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s"rank attach went shuffle-side:\n$s")
  }

  test("q174/q175/q177/q180: the only data-sized exchange is the (type, hour) count") {
    Seq("q174_cusum", "q175_acf", "q177_seasonal", "q180_ccf").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      // the hourly pre-aggregate must be partial (map-side combine)
      val aggs = s.linesIterator.filter(_.contains("HashAggregate")).size
      assert(aggs >= 2, s"$q: expected partial+final aggregate pair:\n$s")
      assert(!s.contains("CartesianProduct"), q)
    }
  }

  test("q182: the sketch collapses to 128 partials map-side before any exchange") {
    val df = SparkEntry.queries("q182_join_size_sketch")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // final select is a literal row — the interesting plan is inside;
    // rebuild the sketch leg and pin the partial-aggregate pair
    val ka = Tables.orders(spark, sf).groupBy(col("o_orderkey").as("k"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
    val leg = ka
      .withColumn("hx", org.apache.spark.sql.functions.md5(col("k").cast("string")))
      .withColumn("w1", org.apache.spark.sql.functions.expr(
        "CAST(conv(substring(hx, 1, 13), 16, 10) AS BIGINT)"))
      .select(col("c"), col("w1"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(0),
            org.apache.spark.sql.functions.lit(127))).as("j"))
      .withColumn("sg", org.apache.spark.sql.functions.expr(
        "1 - 2 * (shiftright(w1, CAST(j % 52 AS INT)) & 1)"))
      .groupBy(col("j")).agg(org.apache.spark.sql.functions.sum(
        col("sg") * col("c")).as("sa"))
    val ls = leg.queryExecution.executedPlan.toString
    val aggs = ls.linesIterator.filter(_.contains("HashAggregate")).size
    assert(aggs >= 2, s"sketch leg must partial-aggregate:\n$ls")
  }
}
