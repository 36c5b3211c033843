package graft.queries

import graft.operators.GlobalRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline
  * runs between raw ingest and tokenized shards: rule-based quality
  * filtering (Gopher-style), global ranking/sorting, PII scrubbing,
  * context-window chunking, unigram LM scoring, embedding quantization,
  * equi-depth histograms, Unicode normalization, and snapshot diffing.
  * All hash-checked against DuckDB with the repo's oracle discipline:
  * integer arithmetic for thresholds, identical float formulas on both
  * engines, md5 for text equality.
  */
object Corpus {

  // shared with Curation's q119 cascade — the rule sets must agree
  private[queries] val StopWords = Seq("the", "a", "of", "to", "and")

  // chunking geometry: 32-token windows advancing by 24 (8-token overlap)
  private val ChunkW = 32
  private val ChunkS = 24

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhonePat = "\\+1-[0-9]{3}-[0-9]{4}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher-style rule filter: each document gets a flag per rule plus
    // the conjunction, so downstream can both FILTER and AUDIT (which
    // rule kills how much of which source — the first question anyone
    // asks of a corpus filter). Pure narrow map, no shuffle; every
    // threshold is integer arithmetic (`3*n <= chars`, never a rounded
    // ratio) so the oracle can't disagree on a boundary. Rules:
    // token count in [30,90], mean word length in [4.0,5.0], distinct
    // ratio >= 1/2, >= 2 distinct stopwords present.
    "q57_gopher_rules" -> { (s, d) =>
      val toks = split(col("text"), " ")
      val stopHits = size(array_distinct(
        filter(toks, t => t.isin(StopWords.map(x => x: Any): _*))))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          length(regexp_replace(col("text"), " ", "")).as("n_word_chars"),
          size(array_distinct(toks)).as("n_distinct"),
          stopHits.as("n_stop"))
        .withColumn("r_count", when(col("n_tokens").between(30, 90), 1).otherwise(0))
        .withColumn("r_wordlen",
          when(col("n_word_chars") >= col("n_tokens") * 4 &&
               col("n_word_chars") <= col("n_tokens") * 5, 1).otherwise(0))
        .withColumn("r_distinct", when(col("n_distinct") * 2 >= col("n_tokens"), 1).otherwise(0))
        .withColumn("r_stop", when(col("n_stop") >= 2, 1).otherwise(0))
        .withColumn("keep",
          col("r_count") * col("r_wordlen") * col("r_distinct") * col("r_stop"))
    },

    // Global total-order rank over orders by price — the operator a
    // single-partition window can't survive at scale (see GlobalRank:
    // range shuffle + reused exchange + broadcast prefix offsets).
    // Price rides as integer cents through DECIMAL(18,2) on both
    // engines; o_orderkey breaks ties so the order is total.
    "q58_global_rank" -> { (s, d) =>
      GlobalRank.rank(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        numParts = 32,
        rankCol = "rank")
        .select(col("rank"), col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_x100"))
    },

    // PII scrub: plant one deterministic email + phone per document
    // (the corpus is synthetic word soup with no organic PII — planting
    // keeps the check non-vacuous), then count and redact with
    // conservative patterns both regex engines (Java / RE2) read
    // identically. Narrow map; at 100 TB this is the same
    // embarrassingly-parallel shape, the only care being that the
    // patterns stay linear-time (these are: no backtracking
    // constructs).
    "q59_pii_scrub" -> { (s, d) =>
      val planted = concat(
        lit("user"), col("doc_id").cast("string"), lit("@example.com "),
        col("text"),
        lit(" +1-555-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
      Tables.documents(s, d)
        .select(col("doc_id"), planted.as("planted"))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("planted"), lit(EmailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("planted"), lit(PhonePat), lit(0))).as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("planted"), EmailPat, "<EMAIL>"),
            PhonePat, "<PHONE>")).as("scrub_md5"))
    },

    // Context-window chunking: split each document into 32-token
    // windows with stride 24 (8-token overlap) — the step that turns
    // cleaned documents into model-context-sized rows. The token array
    // is projected ONCE, then a cheap integer sequence explodes and
    // each chunk is assembled per exploded row with codegen'd
    // slice/concat_ws — never explode the product of a higher-order
    // transform (the Generate re-evaluates it per row; measured ~1
    // ms/row on q17's first draft). Output grows ~n_tokens/stride per
    // doc: a narrow flatMap, no shuffle at any scale.
    "q60_chunk" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), expr(s"(size(toks) - 1) div $ChunkS"))).as("chunk_idx"))
        .select(
          col("doc_id"),
          col("chunk_idx").cast("long").as("chunk_idx"),
          least(lit(ChunkW).cast("long"),
            size(col("toks")) - col("chunk_idx") * ChunkS).as("n_chunk_tokens"),
          md5(concat_ws(" ",
            slice(col("toks"), col("chunk_idx") * ChunkS + 1, lit(ChunkW)))).as("chunk_md5"))
    },

    // Unigram-LM document scoring: corpus term frequencies joined back
    // onto each document's tokens — the classic two-pass "how typical
    // is this document's vocabulary" signal (sum/min of corpus tf; the
    // perplexity analogue without floats, so it hash-matches). The
    // vocabulary aggregate is partial (map-side combine) and the
    // re-join is broadcast here because a closed vocabulary is small;
    // at open-web scale the same plan holds with the broadcast swapped
    // for a shuffle join on `tok` — both sides partial-aggregate first,
    // so the shuffle carries (token, count), not raw tokens.
    "q61_unigram_lm" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      toks.join(broadcast(freq), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("tf")).as("sum_tf"),
          min(col("tf")).as("rarest_tf"))
    },

    // Equi-depth histogram: ntile(20) buckets over order prices,
    // WITHOUT the single-partition window ntile needs — global rank
    // AND the total row count both come from GlobalRank's one range
    // shuffle (the total rides the broadcast offsets join — no second
    // scan, no extra join), and the bucket is the exact integer ntile
    // formula: with q = n div B, r = n mod B, the first r buckets take
    // q+1 rows. Hash-matching DuckDB's built-in ntile proves the
    // distributed decomposition IS ntile. Output is the histogram
    // itself: B rows of count + min/max bounds.
    "q63_equidepth" -> { (s, d) =>
      val B = 20
      val priced = Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("price_x100"))
      val ranked = GlobalRank.rankWithTotal(
        priced, Seq(col("price_x100").asc, col("o_orderkey").asc), numParts = 32,
        rankCol = "rnk", totalCol = Some("__n"))
      // exact ntile: q+1-sized buckets first (r of them), then q-sized.
      // CASE is lazy, so the `div (__n div B)` branch never evaluates
      // when n < B (where q = 0 and every rank takes the THEN branch).
      ranked
        .withColumn("bucket", expr(
          s"""CASE WHEN rnk <= (__n % $B) * ((__n div $B) + 1)
             |     THEN (rnk - 1) div ((__n div $B) + 1) + 1
             |     ELSE (__n % $B) + (rnk - (__n % $B) * ((__n div $B) + 1) - 1) div (__n div $B) + 1
             |END""".stripMargin))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("price_x100")).as("lo_x100"),
          max(col("price_x100")).as("hi_x100"))
    },

    // Int8 embedding quantization (symmetric, per-vector max-abs
    // scale): the storage/serving step that cuts an embedding corpus
    // 4×. Emits per-vector integer checksums (sum/min/max of the
    // quantized values) — floor((x*127.0)/mx) is the identical double
    // expression on both engines, so the integers are exact. Narrow
    // map over the vector column; no shuffle.
    "q62_quantize" -> { (s, d) =>
      // the quantized array is materialized ONCE in its own projection:
      // lambda-bearing expressions are excluded from Spark's
      // subexpression elimination, so inlining `q` into q_sum/q_min/
      // q_max would run the per-element map three times per row (and
      // CollapseProject keeps non-cheap multi-referenced aliases in
      // their own Project, so this shape survives optimization)
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .withColumn("mx", array_max(transform(col("emb"), abs(_))))
        .withColumn("q", transform(col("emb"), x => floor((x * lit(127.0)) / col("mx")).cast("long")))
        .select(
          col("vec_id"),
          size(col("emb")).as("n_dims"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"))
    }
    ,

    // Text normalization: Unicode NFC (native codegen expression —
    // Spark has no built-in), lowercase, whitespace collapse. Even
    // doc_ids get a decomposed-accent + double-space prefix planted
    // (the corpus is ASCII soup, so organic NFC work is zero) — odd
    // ids prove the no-op path, even ids the composition path, and
    // `changed` splits the corpus between them. Narrow map; both
    // engines implement the same Unicode composition tables
    // (java.text.Normalizer / DuckDB nfc_normalize) so the md5s of the
    // cleaned text hash-match.
    "q64_normalize" -> { (s, d) =>
      def nfc(c: org.apache.spark.sql.Column) =
        org.apache.spark.sql.GraftSqlGlue.column(
          graft.functions.NfcNormalize(org.apache.spark.sql.GraftSqlGlue.expression(c)))
      // "Cafe" + U+0301 combining acute + two spaces — NFC composes to
      // "Café", the collapse then removes the double space
      val planted = when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("Cafe\u0301  "), col("text"))).otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), planted.as("raw"))
        .select(
          col("doc_id"),
          length(col("raw")).as("len_raw"),
          length(nfc(col("raw"))).as("len_nfc"),
          when(nfc(col("raw")) =!= col("raw"), 1).otherwise(0).as("changed"),
          // explicit class, not \s: Java's \s matches vertical tab,
          // RE2's does not — the one whitespace dialect divergence
          md5(regexp_replace(lower(nfc(col("raw"))), "[ \\t\\r\\n]+", " ")).as("clean_md5"))
    },

    // Corpus snapshot diff — the incremental-refresh primitive: given
    // two crawl snapshots, classify every doc_id as added / removed /
    // changed / unchanged by FULL OUTER joining on the id and comparing
    // content hashes (the one join class the rest of the surface never
    // exercises; a full outer can't broadcast, so this is the
    // shuffle-join shape at any scale, hash-partitioned on the uniform
    // doc_id). v2 is derived deterministically from v1 (drop %13,
    // rewrite %7, add %11 under new ids) so both engines build the
    // identical pair of snapshots. Added docs get NEGATIVE ids
    // (-(doc_id+1)) — disjoint from every real non-negative id at any
    // corpus scale, unlike an offset which collides once ids reach it.
    "q65_snapshot_diff" -> { (s, d) =>
      val v1 = Tables.documents(s, d).select(col("doc_id"), md5(col("text")).as("h1"))
      val base = Tables.documents(s, d)
      val v2 = base.filter(pmod(col("doc_id"), lit(13)) =!= 0)
        .select(col("doc_id"),
          md5(when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h2"))
        .unionAll(base.filter(pmod(col("doc_id"), lit(11)) === 0)
          .select((-(col("doc_id") + 1L)).as("doc_id"), md5(col("text")).as("h2")))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("h1").isNull, lit("added"))
            .when(col("h2").isNull, lit("removed"))
            .when(col("h1") =!= col("h2"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
    }
  )

  val oracle: Map[String, String] = Map(

    "q64_normalize" ->
      """WITH t AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN 'Cafe' || chr(769) || '  ' || text
                  ELSE text END AS raw
           FROM documents)
         SELECT doc_id,
           length(raw) AS len_raw,
           length(nfc_normalize(raw)) AS len_nfc,
           CASE WHEN nfc_normalize(raw) <> raw THEN 1 ELSE 0 END AS changed,
           md5(regexp_replace(lower(nfc_normalize(raw)), '[ \t\r\n]+', ' ', 'g')) AS clean_md5
         FROM t""",

    "q57_gopher_rules" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks,
                  length(replace(text, ' ', '')) AS wc
           FROM documents)
         SELECT doc_id,
           len(toks) AS n_tokens,
           wc AS n_word_chars,
           len(list_distinct(toks)) AS n_distinct,
           len(list_distinct(list_filter(toks, x -> x IN ('the','a','of','to','and')))) AS n_stop,
           CASE WHEN len(toks) BETWEEN 30 AND 90 THEN 1 ELSE 0 END AS r_count,
           CASE WHEN wc >= 4*len(toks) AND wc <= 5*len(toks) THEN 1 ELSE 0 END AS r_wordlen,
           CASE WHEN len(list_distinct(toks))*2 >= len(toks) THEN 1 ELSE 0 END AS r_distinct,
           CASE WHEN len(list_distinct(list_filter(toks, x -> x IN ('the','a','of','to','and')))) >= 2 THEN 1 ELSE 0 END AS r_stop,
           (CASE WHEN len(toks) BETWEEN 30 AND 90 THEN 1 ELSE 0 END) *
           (CASE WHEN wc >= 4*len(toks) AND wc <= 5*len(toks) THEN 1 ELSE 0 END) *
           (CASE WHEN len(list_distinct(toks))*2 >= len(toks) THEN 1 ELSE 0 END) *
           (CASE WHEN len(list_distinct(list_filter(toks, x -> x IN ('the','a','of','to','and')))) >= 2 THEN 1 ELSE 0 END) AS keep
         FROM t""",

    "q58_global_rank" ->
      """SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
           o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_x100
         FROM orders""",

    "q59_pii_scrub" ->
      """WITH t AS (
           SELECT doc_id,
             'user' || CAST(doc_id AS VARCHAR) || '@example.com ' || text ||
             ' +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS planted
           FROM documents)
         SELECT doc_id,
           len(regexp_extract_all(planted, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(planted, '\+1-[0-9]{3}-[0-9]{4}')) AS n_phones,
           md5(regexp_replace(
             regexp_replace(planted, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrub_md5
         FROM t""",

    "q60_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         c AS (SELECT doc_id, toks,
                 unnest(range(0, ((len(toks)-1)//24)+1)) AS i
               FROM t)
         SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           least(CAST(32 AS BIGINT), len(toks) - i*24) AS n_chunk_tokens,
           md5(array_to_string(toks[i*24+1 : least(i*24+32, len(toks))], ' ')) AS chunk_md5
         FROM c""",

    "q61_unigram_lm" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok)
         SELECT t.doc_id, count(*) AS n_tokens,
           CAST(sum(f.tf) AS BIGINT) AS sum_tf,
           min(f.tf) AS rarest_tf
         FROM toks t JOIN freq f ON t.tok = f.tok
         GROUP BY t.doc_id""",

    "q63_equidepth" ->
      """WITH p AS (SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_x100
           FROM orders),
         r AS (SELECT price_x100,
                 ntile(20) OVER (ORDER BY price_x100, o_orderkey) AS bucket
               FROM p)
         SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_rows,
           min(price_x100) AS lo_x100, max(price_x100) AS hi_x100
         FROM r GROUP BY bucket""",

    "q65_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
         v2 AS (
           SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h2
           FROM documents WHERE doc_id % 13 <> 0
           UNION ALL
           SELECT -(doc_id + 1) AS doc_id, md5(text) AS h2
           FROM documents WHERE doc_id % 11 = 0)
         SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.h1 IS NULL THEN 'added'
                WHEN v2.h2 IS NULL THEN 'removed'
                WHEN v1.h1 <> v2.h2 THEN 'changed'
                ELSE 'unchanged' END AS status
         FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""",

    "q62_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         m AS (SELECT vec_id, emb,
                 list_max(list_transform(emb, x -> abs(x))) AS mx
               FROM e)
         SELECT vec_id,
           len(emb) AS n_dims,
           CAST(list_sum(list_transform(emb, x -> CAST(floor((x*127.0)/mx) AS BIGINT))) AS BIGINT) AS q_sum,
           CAST(list_min(list_transform(emb, x -> CAST(floor((x*127.0)/mx) AS BIGINT))) AS BIGINT) AS q_min,
           CAST(list_max(list_transform(emb, x -> CAST(floor((x*127.0)/mx) AS BIGINT))) AS BIGINT) AS q_max
         FROM m"""
  )
}
