package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Threshold set-similarity join (AllPairs/PPJoin prefix filtering):
  * all pairs of documents whose shingle-set Jaccard ≥ τ, WITHOUT the
  * quadratic blowup a plain inverted-index join suffers on hostile
  * corpora.
  *
  * The plain formulation joins docs on EVERY shared shingle — one
  * stop-shingle present in all n docs manufactures n² candidate rows by
  * itself. Prefix filtering kills that: order each doc's shingles by
  * ascending global document frequency (rarest first, ties by value —
  * one global, deterministic order) and index ONLY the first
  * `len - ceil(τ·len) + 1` of them. Any pair with Jaccard ≥ τ must
  * overlap in at least τ·len elements of either side, so two qualifying
  * docs cannot fail to share an indexed prefix element (missing all of
  * A's prefix leaves at most ceil(τ·la)-1 < τ·la shared elements —
  * contradiction). Stop-shingles sort LAST, land outside every prefix,
  * and generate zero candidates. A length filter
  * (τ·max(la,lb) ≤ min(la,lb)) prunes further, then candidates are
  * verified EXACTLY — the output is identical to brute force, only the
  * candidate generation shrinks.
  *
  * τ is a rational `tauNum/tauDen` so both the prefix length and the
  * final keep test are pure integer arithmetic — bit-identical across
  * engines, no float threshold drift.
  *
  * The input is ELEMENT ROWS (id, element), not an array column: every
  * stage is a plain relational shuffle on a high-cardinality key
  * (partial-aggregable counts, codegen'd hash joins) with no
  * higher-order functions for a Generate to re-evaluate per output row
  * — the shape that holds at 100 TB, where a per-doc array column is
  * also a memory hazard. Verification joins the near-linear candidate
  * list back to the element rows, so its cost is candidates × doc
  * length, not n².
  */
object SimilarityJoin {

  private def normalized(elems: DataFrame, idCol: String, elemCol: String): DataFrame =
    elems.select(qcol(idCol).as("id"), qcol(elemCol).as("e")).distinct()

  /** Candidate pairs (unverified): prefix-sharing + length-compatible,
    * with each side's set size attached. Package-private so the
    * hostile-corpus spec can assert the candidate count stays
    * near-linear. Input: normalized (id, e) rows. */
  private[operators] def candidatePairs(e: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    val dfreq = e.groupBy(col("e")).agg(count(lit(1)).as("df"))
    // rank and set size from ONE hash-partition of the element rows:
    // row_number and the per-doc count share the partitionBy(id)
    // exchange (no separate groupBy+join for lengths)
    val w = Window.partitionBy(col("id")).orderBy(col("df").asc, col("e").asc)
    val wLen = Window.partitionBy(col("id"))
    // prefix length = len - ceil(tau*len) + 1, all-integer ceil
    // (`div`, not `/`: the Column API's / is double division)
    val ceilTauLen = expr(s"(len * $tauNum + ${tauDen - 1}) div $tauDen")
    val prefix = e.join(dfreq, "e")
      .withColumn("pos", row_number().over(w))
      .withColumn("len", count(lit(1)).over(wLen))
      .filter(col("pos") <= col("len") - ceilTauLen + 1)
      .select(col("e"), col("id"), col("len"))
    prefix.select(col("e"), col("id").as("doc_a"), col("len").as("la"))
      .hint("shuffle_hash")
      .join(prefix.select(col("e"), col("id").as("doc_b"), col("len").as("lb")), "e")
      .filter(col("doc_a") < col("doc_b"))
      // length filter: Jaccard >= tau forces tau * max(la, lb) <= min
      .filter(greatest(col("la"), col("lb")) * tauNum <= least(col("la"), col("lb")) * tauDen)
      .select(col("doc_a"), col("doc_b"), col("la"), col("lb")).distinct()
  }

  /** All pairs with Jaccard(elements_a, elements_b) ≥ tauNum/tauDen.
    *
    * @param elems  one row per (document id, set element); duplicates
    *               tolerated (de-duplicated internally)
    * @return (doc_a, doc_b, shared, total) with doc_a < doc_b; Jaccard
    *         = shared/total ≥ τ exactly (integer comparison)
    */
  def jaccardJoin(elems: DataFrame, idCol: String, elemCol: String,
                  tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be in (0, 1]: $tauNum/$tauDen")
    // materialize the deduped element rows ONCE: dfreq, the prefix
    // ranking, and verification all read them, and without a checkpoint
    // each reference re-runs the upstream tokenize/explode/dedup
    val e = normalized(elems, idCol, elemCol).localCheckpoint()
    val cands = candidatePairs(e, tauNum, tauDen)
    // verification touches only documents that appear in a candidate
    // pair — reduce the element rows to those docs first (near-linear,
    // usually broadcastable; AQE picks), then count shared elements by
    // walking A's elements and keeping those present in B
    val candDocs = cands.select(col("doc_a").as("id"))
      .union(cands.select(col("doc_b").as("id"))).distinct()
    val eCand = e.join(candDocs, Seq("id"), "leftsemi")
    cands
      .join(eCand.select(col("id").as("doc_a"), col("e")), "doc_a")
      .join(eCand.select(col("id").as("doc_b"), col("e")), Seq("doc_b", "e"))
      .groupBy(col("doc_a"), col("doc_b"), col("la"), col("lb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") * tauDen >= (col("la") + col("lb") - col("shared")) * tauNum)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("la") + col("lb") - col("shared")).as("total"))
  }
}
