package graft.queries

import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q38 — the multimodal path's row in the driver's correctness gate.
  *
  * Treats each `documents` row as a media object: payload = the UTF-8
  * bytes of `text`, media type assigned round-robin by id (image /
  * audio / video), metadata hints fixed. The FULL binary-column
  * pipeline then runs for real — typed `Dataset[MediaRow]`, repartition
  * by id, per-partition decode through the [[Media.Decoder]] boundary —
  * and emits one integer-exact feature row per document.
  *
  * Oracle split (DuckDB has no crc32): `n_bytes`, `media_type`,
  * `width/height`, and `n_frames_sampled` are recomputed ANALYTICALLY
  * by DuckDB from the same `documents` parquet (strlen over UTF-8 bytes,
  * the round-robin type rule, the every-4KB frame rule) — fully
  * independent. `checksum` (CRC32 of the payload) and `feature_fp` (an
  * integer fold of the 8-band rolling-hash feature vector) join in from
  * a golden parquet frozen in-repo (testdata/q38_golden/), whose
  * semantics are pinned independently by MediaSpec's hand-computed
  * CRC32/rolling-hash expectations. Any drift in the byte path —
  * encoding, truncation, partition-dependent decode order, float
  * quantization — breaks the hash match.
  */
object MediaVerify {

  /** Deterministic round-robin media type; doc ids are non-negative. */
  private def mediaTypeOf(id: Long): String =
    Seq("image", "audio", "video")((id % 3).toInt)

  /** documents → MediaRow (type round-robin by id, payload = UTF-8
    * bytes of `text`, fixed metadata hints). `asciiOnly` filters to
    * byte-length == char-length docs for queries whose oracle slices
    * characters. */
  private def mediaFromDocuments(s: SparkSession, dir: String,
                                 asciiOnly: Boolean): org.apache.spark.sql.Dataset[Media.MediaRow] = {
    import s.implicits._
    val docs0 = s.read.parquet(s"$dir/documents.parquet")
    val docs = (if (asciiOnly) docs0.filter(octet_length(col("text")) === length(col("text"))) else docs0)
      .select("doc_id", "text").as[(Long, String)]
    docs.map { case (id, text) =>
      Media.MediaRow(id, Media.MediaMeta(mediaTypeOf(id), 640, 480, 16000),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** The shared Spark side: documents → MediaRow → StubDecoder features.
    * Also used by GoldenGen to freeze checksum/feature_fp. */
  def features(s: SparkSession, dir: String): DataFrame = {
    val media = mediaFromDocuments(s, dir, asciiOnly = false)
    // decoder is the opt-in seam: default = StubDecoder (the gate path,
    // pinned by the q38 golden parquet); spark.graft.media.decoder =
    // imageio swaps in the real JDK codec for corpora whose payloads
    // are actual encoded images (RealCodecSpec proves the seam)
    Media.extractFeatures(media, Media.decoderFor(s, 8), partitions = 32)
      .toDF()
      .select(
        col("media_id"),
        col("mediaType").as("media_type"),
        col("n_bytes"),
        col("checksum"),
        col("width"),
        col("height"),
        col("n_frames_sampled"),
        // feature floats are exact thousandths by construction
        // (StubDecoder: (h % 1000) / 1000f), so ×1000+round recovers the
        // integers exactly; an order-sensitive polynomial fold mod a
        // 1e9-scale prime fingerprints the vector without overflowing
        // Long under ANSI arithmetic (acc stays < 2^30, ×1009 < 2^40).
        expr("aggregate(feature, 0L, (acc, x) -> pmod(acc * 1009 + cast(round(cast(x as double) * 1000) as bigint), 1000000007L))")
          .as("feature_fp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_multimodal" -> ((s, dir) => features(s, dir)),

    // q47 — the frame-sampling face of the media pipeline: every k-th
    // 4 KB block of each video payload as (media_id, frame_idx,
    // frame_md5). DuckDB recomputes each frame analytically (substr
    // over the same UTF-8 text the payload was built from), so the
    // whole binary blocking/striding path is oracle-checked without a
    // golden. Scale shape: narrow flatMap, emits digests not blobs.
    "q47_frame_sample" -> { (s, dir) =>
      // ASCII-only, filtered in BOTH engines: Spark blocks the UTF-8
      // BYTE payload while DuckDB's substr slices CHARACTERS, so a
      // multibyte doc would shift boundaries and silently diverge —
      // exclude it symmetrically instead of relying on the corpus
      // happening to be ASCII
      val media = mediaFromDocuments(s, dir, asciiOnly = true)
      Media.sampleFrames(media, everyK = 2)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(col("frame_bytes")).as("frame_md5"))
    },

    // q184 — the audio face of the media pipeline: payloads as 8-bit
    // PCM, 256-sample windows, exact integer energy Σ(b−96)², silence
    // below 500·n_samples — the VAD/loudness segmentation a real audio
    // pass produces. ASCII-only for the byte-vs-character reason of
    // q47; DuckDB recomputes every window analytically (ascii() over
    // substr positions), so the whole typed byte-windowing path —
    // repartition, per-task scan, compact (idx, energy) rows out — is
    // oracle-checked with no golden.
    "q184_audio_energy" -> { (s, dir) =>
      val media = mediaFromDocuments(s, dir, asciiOnly = true)
      Media.audioEnergy(media, window = 256, zero = 96,
          silenceThreshold = 500L, partitions = 32).toDF()
        .select(col("media_id"), col("win_idx"), col("n_samples"),
          col("energy"), col("is_silence"))
    },

    // q192 — the temporal face of the video pipeline: SCENE-CHANGE
    // detection by consecutive-frame histogram distance. Each 128-byte
    // frame reduces to a 16-bucket byte histogram (the compact
    // signature — a real pipeline histograms decoded luma at the same
    // boundary); L1 distance between consecutive frames is an exact
    // integer, and a boundary fires when the distance exceeds a
    // quarter of the combined frame mass (4·l1 > n1 + n2). ASCII-only
    // for the q47 byte-vs-character reason; the oracle recomputes
    // every histogram analytically from text positions. Shapes: the
    // histogram pass emits 16 longs per frame (never frame bytes);
    // the consecutive pairing is a per-media lag window over
    // frame-count-bounded rows.
    "q192_scene_detect" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val media = mediaFromDocuments(s, dir, asciiOnly = true)
      // 128-byte frames: the driver corpus's ~300-char payloads must
      // yield multi-frame videos or the temporal pairing is vacuous
      val hists = Media.frameHistograms(media, buckets = 16, frameBytes = 128).toDF()
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx").asc)
      hists
        .withColumn("prev_hist", lag(col("hist"), 1).over(w))
        .withColumn("prev_n", lag(col("n_bytes"), 1).over(w))
        .filter(col("prev_hist").isNotNull)
        .withColumn("l1", expr(
          "aggregate(zip_with(hist, prev_hist, (a, b) -> abs(a - b)), 0L, (acc, x) -> acc + x)"))
        .withColumn("is_scene_change", col("l1") * 4L > col("n_bytes") + col("prev_n"))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("n_bytes"), col("l1"), col("is_scene_change"))
    },

    // q113 — the resize face of the media pipeline: 640×480 payloads
    // scaled to 64×48 (stub: the 1/100-pixel-ratio byte prefix, dims
    // updated). ASCII-only for the same byte-vs-character reason as
    // q47; the oracle recomputes the output LENGTH arithmetic and the
    // resized payload's md5 analytically from the source text — the
    // whole typed transform (repartition, per-task map, binary out) is
    // content-checked with no golden.
    "q113_media_resize" -> { (s, dir) =>
      val media = mediaFromDocuments(s, dir, asciiOnly = true)
      Media.resize(media, tw = 64, th = 48, partitions = 32).toDF()
        .select(col("media_id"),
          col("out_w").cast("long").as("out_w"),
          col("out_h").cast("long").as("out_h"),
          col("n_bytes_in"), col("n_bytes_out"),
          md5(col("payload")).as("out_md5"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q38_multimodal" ->
      """WITH src AS (
           SELECT doc_id AS media_id,
                  CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
                  END AS media_type,
                  strlen(text) AS n_bytes
           FROM documents
         )
         SELECT s.media_id, s.media_type, s.n_bytes, g.checksum,
                CAST(640 AS INTEGER) AS width, CAST(480 AS INTEGER) AS height,
                CAST(CASE WHEN s.media_type = 'video'
                          THEN GREATEST(1, s.n_bytes // 4096) ELSE 1 END AS INTEGER)
                  AS n_frames_sampled,
                g.feature_fp
         FROM src s
         JOIN read_parquet('/root/repo/testdata/q38_golden/*.parquet') g USING (media_id)
         WHERE g.corpus_chars = (SELECT sum(n_chars) FROM documents)""",
    "q47_frame_sample" ->
      """WITH v AS (
           SELECT doc_id, text, strlen(text) AS L FROM documents
           WHERE doc_id % 3 = 2 AND strlen(text) = length(text)
         ),
         f AS (
           SELECT doc_id AS media_id, text,
                  unnest(range(0, CAST(ceil(L / 4096.0) AS BIGINT))) AS frame_idx
           FROM v
         )
         SELECT media_id, frame_idx,
                md5(substr(text, CAST(frame_idx * 4096 + 1 AS BIGINT), 4096)) AS frame_md5
         FROM f WHERE frame_idx % 2 = 0""",
    "q184_audio_energy" ->
      """WITH a AS (
           SELECT doc_id AS media_id, text, strlen(text) AS L FROM documents
           WHERE doc_id % 3 = 1 AND strlen(text) = length(text)
         ),
         pos AS (
           SELECT media_id, text,
                  unnest(range(0, L)) AS i
           FROM a
         ),
         w AS (
           SELECT media_id, i // 256 AS win_idx,
                  (ascii(substr(text, CAST(i + 1 AS BIGINT), 1)) - 96)
                    * (ascii(substr(text, CAST(i + 1 AS BIGINT), 1)) - 96) AS d2
           FROM pos
         )
         SELECT media_id, win_idx::BIGINT AS win_idx,
                count(*)::BIGINT AS n_samples, sum(d2)::BIGINT AS energy,
                sum(d2) < 500 * count(*) AS is_silence
         FROM w GROUP BY 1, 2""",

    "q192_scene_detect" ->
      """WITH v AS (
           SELECT doc_id AS media_id, text, strlen(text) AS L FROM documents
           WHERE doc_id % 3 = 2 AND strlen(text) = length(text)
         ),
         fr AS (
           SELECT media_id, text, L,
                  unnest(range(0, CAST(ceil(L / 128.0) AS BIGINT))) AS frame_idx
           FROM v
         ),
         fb AS (
           SELECT media_id, frame_idx, text,
                  least(L - frame_idx * 128, 128)::BIGINT AS n_bytes
           FROM fr
         ),
         pos AS (
           SELECT media_id, frame_idx, n_bytes, text,
                  unnest(range(0, n_bytes)) AS i
           FROM fb
         ),
         hh AS (
           SELECT media_id, frame_idx, n_bytes,
                  ascii(substr(text, CAST(frame_idx * 128 + i + 1 AS BIGINT), 1)) % 16
                    AS bucket,
                  count(*)::BIGINT AS c
           FROM pos GROUP BY 1, 2, 3, 4
         ),
         dense AS (
           SELECT f.media_id, f.frame_idx, f.n_bytes, b.bucket,
                  coalesce(hh.c, 0)::BIGINT AS c
           FROM fb f CROSS JOIN (SELECT unnest(range(0, 16)) AS bucket) b
           LEFT JOIN hh ON hh.media_id = f.media_id
             AND hh.frame_idx = f.frame_idx AND hh.bucket = b.bucket
         ),
         l1 AS (
           SELECT a.media_id, a.frame_idx, a.n_bytes,
                  sum(abs(a.c - p.c))::BIGINT AS l1,
                  max(p.n_bytes)::BIGINT AS prev_n
           FROM dense a JOIN dense p ON p.media_id = a.media_id
             AND p.frame_idx = a.frame_idx - 1 AND p.bucket = a.bucket
           GROUP BY 1, 2, 3
         )
         SELECT media_id, frame_idx, n_bytes, l1,
                l1 * 4 > n_bytes + prev_n AS is_scene_change
         FROM l1""",

    "q113_media_resize" ->
      """WITH m AS (
           SELECT doc_id AS media_id, text, strlen(text) AS n
           FROM documents WHERE strlen(text) = length(text)
         ),
         r AS (
           SELECT media_id, text, n,
                  least(greatest(1, (n * 64 * 48) // (640 * 480)), n) AS out_len
           FROM m
         )
         SELECT media_id, CAST(64 AS BIGINT) AS out_w, CAST(48 AS BIGINT) AS out_h,
                n::BIGINT AS n_bytes_in, out_len::BIGINT AS n_bytes_out,
                md5(substr(text, 1, CAST(out_len AS BIGINT))) AS out_md5
         FROM r"""
  )
}
