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
  * ascending global document frequency (rarest first, ties by interned
  * id — any single order shared by all docs is correct, and the
  * candidate set it induces never changes the verified OUTPUT) and
  * index ONLY the first
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
  * — the shape that holds at 100 TB, where a corpus-wide array column
  * is also a memory hazard. Verification re-gathers ONLY candidate
  * docs' sets into per-doc arrays and intersects in-core, so its cost
  * is candidates × doc length, not n² — and not a candidates×length
  * shuffle either.
  */
object SimilarityJoin {

  private def normalized(elems: DataFrame, idCol: String, elemCol: String): DataFrame =
    elems.select(qcol(idCol).as("id"), qcol(elemCol).as("e")).distinct()

  /** Candidate pairs (unverified): prefix-sharing + length-compatible +
    * position-compatible, with each side's set size attached.
    * Package-private so the hostile-corpus spec can assert the candidate
    * count stays near-linear. Input: normalized (id, e) rows.
    *
    * The positional filter (PPJoin): a shared element at global-order
    * ranks (pa, pb) of sets sized (la, lb) bounds the overlap —
    * shared elements strictly before it number ≤ min(pa,pb)-1, it and
    * later ones ≤ 1+min(la-pa, lb-pb), so
    * overlap ≤ least(pa,pb) + least(la-pa, lb-pb). Every shared prefix
    * element yields a valid bound; the groupBy (which replaces the
    * plain distinct — same shuffle, so the filter is FREE) takes the
    * tightest and drops pairs that provably cannot reach
    * α = ⌈τ/(1+τ)·(la+lb)⌉, the Jaccard-≥τ overlap minimum. On corpora
    * whose candidates come from RARE shared shingles the bound prunes
    * little (rare elements sit at the front of the order, where it is
    * weakest — q51's corpus: <1%); it earns its keep on skewed/sloppy
    * corpora where mid-frequency elements dominate candidates. */
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
      .select(col("e"), col("id"), col("len"), col("pos"))
    prefix.select(col("e"), col("id").as("doc_a"), col("len").as("la"), col("pos").as("pa"))
      .hint("shuffle_hash")
      .join(prefix.select(col("e"), col("id").as("doc_b"), col("len").as("lb"), col("pos").as("pb")), "e")
      .filter(col("doc_a") < col("doc_b"))
      // length filter: Jaccard >= tau forces tau * max(la, lb) <= min
      .filter(greatest(col("la"), col("lb")) * tauNum <= least(col("la"), col("lb")) * tauDen)
      .groupBy(col("doc_a"), col("doc_b"), col("la"), col("lb"))
      .agg(min(least(col("pa"), col("pb")) + least(col("la") - col("pa"), col("lb") - col("pb"))).as("ub"))
      .filter(col("ub") * (tauNum + tauDen) >= (col("la") + col("lb")) * tauNum)
      .select(col("doc_a"), col("doc_b"), col("la"), col("lb"))
  }

  /** Driver-side posting-list cost probe: (Σ df², Σ df) over the
    * element key of DEDUPED (id, element) rows. Σ df² is the candidate
    * row volume an inverted-index self-join meets (each element e
    * contributes df(e)² joined rows); Σ df is the posting count the
    * scan already pays. Their ratio is the join's average fan-out —
    * the quantity a stop-shingle inflates quadratically and the signal
    * the q17/q117 plans switch on: fan-out ≤ ~8 means the direct
    * posting join is within a constant of the scan (take it — fewer
    * stages); above it, the prefix-filtered operators bound candidate
    * generation regardless of how hostile the df distribution is. Both
    * branches are EXACT — this chooses a physical plan, never an
    * answer. Cost: one partial-aggregable count per element plus a
    * 1-row collect, a prefix of what every branch computes anyway. */
  def postingCost(elems: DataFrame, keyCols: Seq[String]): (Long, Long) = {
    val s = postingStats(elems, keyCols, hazardDf = Long.MaxValue)
    (s.df2, s.dfSum)
  }

  /** [[postingCost]] plus the HAZARD mass: the share of Σ df²
    * contributed by near-universal elements (df ≥ hazardDf). The
    * discriminator the containment join's switch needs: prefix
    * filtering provably ejects near-universal elements (max df ⇒ they
    * sort last, outside every prefix), so a blowup ATTRIBUTABLE to them
    * is exactly the blowup escalation fixes. A high Σ df² whose mass
    * sits in mid-df elements (true duplication — clones) is
    * output-order work no candidate scheme can avoid; the direct join
    * is then the cheaper exact plan. One aggregate, one 1-row collect. */
  final case class PostingStats(df2: Long, dfSum: Long, hazard: Long)

  def postingStats(elems: DataFrame, keyCols: Seq[String], hazardDf: Long): PostingStats = {
    val r = elems.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df")), sum(col("df")),
        sum(when(col("df") >= hazardDf, col("df") * col("df")).otherwise(lit(0L))))
      .collect().head
    if (r.isNullAt(0)) PostingStats(0L, 0L, 0L)
    else PostingStats(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Candidate DIRECTED pairs for the containment join (unverified):
    * a-side PREFIX rows joined against the FULL b-side index, plus the
    * b-size filter. Package-private so the hostile-corpus spec can
    * assert the stop-shingle defense is ENGAGED (near-zero candidates),
    * not just documented.
    *
    * Losslessness of the prefix for |A∩B| ≥ τ·|A| (τ = tauNum/tauDen):
    * order every set by ascending global df (ties by element — any one
    * shared total order works); index only a's first
    * p = na − ⌈τ·na⌉ + 1 elements. If NONE of those p elements is in
    * B, then A∩B ⊆ A's remaining na − p = ⌈τ·na⌉ − 1 < τ·na elements —
    * contradiction with |A∩B| ≥ τ·na. So every qualifying ordered pair
    * shares an a-PREFIX element with b's FULL set, and joining prefix_a
    * against the full index on the element key finds it. The b side
    * needs no prefix (containment is asymmetric: only |A| normalizes),
    * but does need nb·tauDen ≥ na·tauNum (|A∩B| ≤ |B|). A stop-shingle
    * with df ≈ n sorts LAST in the global order, lands outside every
    * prefix, and therefore contributes ZERO candidates from the a side
    * — its n-long posting list on the b side is never probed. */
  private[operators] def containmentCandidates(e: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    val dfreq = e.groupBy(col("e")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df").asc, col("e").asc)
    val wLen = Window.partitionBy(col("id"))
    val ceilTauLen = expr(s"(len * $tauNum + ${tauDen - 1}) div $tauDen")
    val ranked = e.join(dfreq, "e")
      .withColumn("pos", row_number().over(w))
      .withColumn("len", count(lit(1)).over(wLen))
    val prefixA = ranked
      .filter(col("pos") <= col("len") - ceilTauLen + 1)
      .select(col("e"), col("id").as("doc_a"), col("len").as("na"))
    prefixA
      .hint("shuffle_hash") // exploded build side: never broadcast (q17's rationale)
      .join(ranked.select(col("e"), col("id").as("doc_b"), col("len").as("nb")), "e")
      .filter(col("doc_a") =!= col("doc_b"))
      // b-size filter: shared ≤ nb, so nb must admit τ·na
      .filter(col("nb") * tauDen >= col("na") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("na")).distinct()
  }

  /** All DIRECTED pairs with |elements_a ∩ elements_b| ≥ τ·|elements_a|
    * — the asymmetric containment join (quote/subset duplication: a
    * short doc fully embedded in a long one has low Jaccard but full
    * containment). Same exact-verification discipline as [[jaccardJoin]]:
    * prefix filtering only shrinks CANDIDATE generation (losslessly —
    * proof on [[containmentCandidates]]); every candidate is verified by
    * an exact sorted-set intersection, so the output is identical to
    * brute force.
    *
    * @param elems one row per (document id, set element); duplicates
    *              tolerated (de-duplicated internally)
    * @return (doc_a, doc_b, shared, na) with doc_a ≠ doc_b and
    *         shared·tauDen ≥ na·tauNum exactly (integer comparison)
    */
  def containmentJoin(elems: DataFrame, idCol: String, elemCol: String,
                      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be in (0, 1]: $tauNum/$tauDen")
    // same staging as jaccardJoin: dedup once, intern elements to dense
    // longs so every shuffle moves 8-byte keys, checkpoint shared subtrees
    val raw = normalized(elems, idCol, elemCol).localCheckpoint()
    val dict = raw.select(col("e")).distinct()
      .withColumn("eid", monotonically_increasing_id())
    val e = raw.join(dict, "e")
      .select(col("id"), col("eid").as("e")).localCheckpoint()
    val cands = containmentCandidates(e, tauNum, tauDen).localCheckpoint()
    val candDocs = cands.select(col("doc_a").as("id"))
      .union(cands.select(col("doc_b").as("id"))).distinct()
    val sets = e.join(candDocs, Seq("id"), "leftsemi")
      .groupBy(col("id")).agg(array_sort(collect_list(col("e"))).as("es"))
      .localCheckpoint()
    cands
      .join(sets.select(col("id").as("doc_a"), col("es").as("es_a")), "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("es").as("es_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("na"),
        intersectSize(col("es_a"), col("es_b")).as("shared"))
      .filter(col("shared") * tauDen >= col("na") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("na"))
  }

  /** codegen'd merge-walk intersection of two sorted long arrays —
    * shared by the jaccard and containment verification stages. */
  private def intersectSize(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlGlue.column(
      graft.functions.SortedLongIntersectSize(
        org.apache.spark.sql.GraftSqlGlue.expression(a),
        org.apache.spark.sql.GraftSqlGlue.expression(b)))

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
    // Intern elements to dense long ids ONCE, before anything shuffles
    // on them: every downstream exchange (df count, prefix rank, the
    // prefix self-join, the per-doc set arrays) then moves 8-byte keys
    // instead of ~30-byte shingle strings — the dominant byte volume of
    // the whole operator at any scale — and the final intersection
    // compares longs. The ids only need to be distinct and stable
    // within this run: the interned table is checkpointed, so every
    // consumer reads ONE materialized assignment (outputs carry only
    // doc ids and counts, so the dictionary is never reversed).
    val raw = normalized(elems, idCol, elemCol).localCheckpoint()
    val dict = raw.select(col("e")).distinct()
      .withColumn("eid", monotonically_increasing_id())
    val e = raw.join(dict, "e")
      .select(col("id"), col("eid").as("e")).localCheckpoint()
    // checkpointed: the candidate list feeds BOTH the candidate-doc set
    // build and the final verification join — without this the whole
    // candidate subtree (the expensive stage) executes twice
    val cands = candidatePairs(e, tauNum, tauDen).localCheckpoint()
    // verification touches only documents that appear in a candidate
    // pair: gather each such doc's (deduped, interned) element set into
    // one array and intersect per candidate in-core. This costs the
    // same candidates × doc-length arithmetic as an element-row join
    // but moves it OUT of the shuffle: the per-doc set table is
    // near-linear and joins to the candidate list on doc id (AQE
    // broadcasts when small). Was the dominant q51 stage as an
    // element-row equi-join (16M joined rows at sf0.1); the per-doc
    // array is bounded by one document's shingle count, which already
    // had to fit in memory.
    val candDocs = cands.select(col("doc_a").as("id"))
      .union(cands.select(col("doc_b").as("id"))).distinct()
    // sets are SORTED once at build so the per-candidate intersection is
    // a codegen'd merge walk (SortedLongIntersectSize) — array_intersect
    // allocates a hash set per candidate pair and dominated this stage
    val sets = e.join(candDocs, Seq("id"), "leftsemi")
      .groupBy(col("id")).agg(array_sort(collect_list(col("e"))).as("es"))
      .localCheckpoint()
    cands
      .join(sets.select(col("id").as("doc_a"), col("es").as("es_a")), "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("es").as("es_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("la"), col("lb"),
        intersectSize(col("es_a"), col("es_b")).as("shared"))
      .filter(col("shared") * tauDen >= (col("la") + col("lb") - col("shared")) * tauNum)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("la") + col("lb") - col("shared")).as("total"))
  }
}
