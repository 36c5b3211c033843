package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over a text column.
  *
  * Pipeline (all narrow until the band join):
  *   word-3-gram shingles → k MinHash signature entries (murmur3 with
  *   per-position salt) → b bands of r rows → band-bucket equi-join →
  *   candidate pairs → signature agreement count (estimated Jaccard).
  *
  * Shingles (not unigrams) are the similarity unit: unigram sets are
  * dense under a small vocabulary (almost everything looks similar),
  * while shingle sets only collide for genuinely near-duplicate text —
  * the same reason q17's exact verifier uses 3-grams.
  *
  * Scale shape: the only data-keyed shuffle is the band-bucket join,
  * whose key (bandIdx, bandKey) is uniform by construction — no skew.
  * The candidate set is |pairs sharing a band| << |all pairs|, which is
  * the point vs the O(n²) exact cross-join. With k=32, b=8, r=4 the
  * match-probability curve crosses ~0.5 near Jaccard ≈ 0.6.
  *
  * Deterministic AND cross-engine reproducible: the k hash functions
  * are the classic universal-hash family h_j(s) = (a_j·x(s) + b_j) mod
  * M over ONE md5-derived 31-bit base hash x(s) per shingle (the same
  * md5-hex-prefix primitive the q16 SimHash oracle already proved
  * portable), with literal (a_j, b_j) constants. Every value the
  * operator computes — signatures, band keys, match counts — is
  * therefore expressible in plain SQL, which is what lets the driver
  * hash-match q15 against a DuckDB oracle instead of trusting a
  * rows-only check (Spark's murmur3 `hash()` has no DuckDB analogue).
  * One md5 per shingle row; the 31-bit base keeps a_j·x + b_j under
  * 2^62, so ANSI-mode arithmetic can never overflow.
  */
object MinHashDedup {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands

  /** Modulus of the affine hash family (fits 31-bit operands safely). */
  val HashMod = 1000000007L
  /** 31-bit space of the base hash. */
  val BaseMod = 2147483648L

  /** Literal (a_j, b_j) per signature position, from a fixed-seed LCG
    * (java.util.Random is spec-pinned, so these are stable constants —
    * and they are spliced verbatim into the DuckDB oracle SQL). */
  val HashParams: IndexedSeq[(Long, Long)] = {
    val r = new scala.util.Random(20260812L)
    IndexedSeq.fill(NumHashes)((r.nextInt(Int.MaxValue - 1).toLong + 1L, r.nextInt(Int.MaxValue).toLong))
  }

  /** Distinct word-3-gram shingles from a pre-split token array column.
    * Tokenizing once and shingling over the array keeps the per-shingle
    * cost O(1) — inlining split() into the lambda would re-tokenize the
    * whole text for every window. */
  def shinglesFromTokens(tokens: Column): Column =
    array_distinct(expr(
      s"transform(sequence(1, greatest(size(${tokens.toString}) - 2, 1)), " +
        s"i -> concat_ws(' ', element_at(${tokens.toString}, i), " +
        s"element_at(${tokens.toString}, i + 1), element_at(${tokens.toString}, i + 2)))"))

  /** Distinct word-3-gram shingles of a text column. */
  def shingles(text: Column): Column = shinglesFromTokens(split(text, " "))

  /** (docs: [idCol: long, textCol: string]) → signature per doc:
    * sig[j] = min over shingles of (a_j·x(shingle) + b_j) mod M.
    *
    * Shingles are built by exploding a POSITION sequence and assembling
    * each one with codegen'd concat_ws/element_at — exploding a
    * transform+array_distinct array instead re-evaluates those
    * CodegenFallback HOFs inside the Generate (the q17 lesson; measured
    * ~5 s of pure overhead at sf0.1). Duplicate shingles need no
    * dedup here: `min` is duplicate-insensitive. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // fan the skinny doc rows out BEFORE the shingle expansion: a
    // single-split source (one parquet file locally) would otherwise
    // run the whole explode+md5 on one core (see queries.Tables.fanOut)
    val fanned = docs.repartition(
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val toks = fanned
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), greatest(size(col("toks")) - 2, lit(1)))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ",
          element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + 1),
          element_at(col("toks"), col("i") + 2)).as("tok"))
      // ONE md5 per shingle row; all k hashes derive from it affinely
      .withColumn("x",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % BaseMod)
    // one aggregation computing all k mins — single shuffle by doc_id
    val minCols: Seq[Column] = HashParams.zipWithIndex.map { case ((a, b), j) =>
      min(expr(s"($a * x + $b) % $HashMod")).as(s"h$j")
    }
    toks.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until NumHashes).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** Candidate near-duplicate pairs: share at least one LSH band.
    * Output: (doc_a, doc_b, est_matches) where est_matches counts equal
    * signature positions (estimated Jaccard = est_matches / k). */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String, minMatches: Int): DataFrame = {
    val sigs = signatures(docs, idCol, textCol)
    // explode the band INDEX and key the bucket by the band's VALUES
    // (concatenated) — engine-neutral, unlike hashing the slice (same
    // Generate-stays-codegen rationale as signatures)
    val bands = sigs
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(Bands - 1))).as("band_idx"))
      .withColumn("band_key", concat_ws("_",
        (0 until RowsPerBand).map(r =>
          element_at(col("sig"), col("band_idx") * RowsPerBand + lit(r) + 1)): _*))
    val a = bands.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("band_idx"), col("band_key"))
    val b = bands.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)").as("est_matches"))
      .distinct()
      .filter(col("est_matches") >= minMatches)
  }
}
