package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct,
  * and per-batch feature extraction runs as an executor-side
  * `mapPartitions` over the bytes (the JVM analogue of a batched
  * `mapInPandas` decode UDF).
  *
  * The actual codec step is STUBBED — this container has no image or
  * audio libraries — behind [[Decoder]]: the deterministic fake reads
  * real bytes and produces shape/feature values from them, so the
  * Spark-side contract (schema, batching, partitioning, null handling)
  * is fully real and tested; swapping in a JNI/library decoder is a
  * one-class change.
  *
  * Scale notes: media rows are heavy (MBs) — the decode stage
  * repartitions by id so one straggler blob can't serialize a whole
  * partition's worth of memory behind it, and emits only compact
  * features (never re-emits the payload) so downstream shuffles move
  * KBs, not MBs.
  */
object Media {

  final case class MediaMeta(mediaType: String, widthHint: Int, heightHint: Int, sampleRateHz: Int)
  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long,
                                 mediaType: String,
                                 n_bytes: Long,
                                 checksum: Long,
                                 width: Int,
                                 height: Int,
                                 n_frames_sampled: Int,
                                 feature: Array[Float])

  /** The decode boundary. Real implementations wrap an image/audio
    * codec; [[StubDecoder]] derives everything deterministically from
    * the bytes. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic fake decoder: "dimensions" from metadata hints,
    * "features" from a rolling checksum of the payload — pure function
    * of the input so tests and replays are stable. */
  final class StubDecoder(featureDim: Int = 8) extends Decoder {
    override def decode(row: MediaRow): MediaFeatures = {
      val crc = new java.util.zip.CRC32()
      crc.update(row.payload)
      val dim = featureDim
      val feat = Array.tabulate(dim) { i =>
        // per-band rolling hash of the payload — stands in for a real
        // embedding; deterministic in the bytes
        var h = 1125899906842597L + i
        var j = i
        while (j < row.payload.length) { h = 31 * h + row.payload(j); j += dim }
        (h % 1000).toFloat / 1000f
      }
      val frames = if (row.meta.mediaType == "video") math.max(1, row.payload.length / 4096) else 1
      MediaFeatures(row.media_id, row.meta.mediaType, row.payload.length.toLong,
        crc.getValue, row.meta.widthHint, row.meta.heightHint, frames, feat)
    }
  }

  /** Batched executor-side decode: repartition by id, then decode per
    * partition with one Decoder instance per task. */
  def extractFeatures(media: Dataset[MediaRow], decoder: Decoder, partitions: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(_.map(decoder.decode))
  }

  final case class ResizedMedia(media_id: Long, out_w: Int, out_h: Int,
                                n_bytes_in: Long, n_bytes_out: Long,
                                payload: Array[Byte])

  /** Resize stub: payload scales by the target/source pixel ratio —
    * out_len = max(1, n·(tw·th) div (w·h)), capped at n (a stub cannot
    * invent bytes on upscale) — and the resized "image" is that byte
    * prefix. The PLUMBING is the real contract a JNI/library resizer
    * drops into: typed dataset in, repartition by id, one mapPartitions
    * decode-transform per task, binary out with updated dimensions.
    * Deterministic: a pure function of (payload, dims), so task
    * retries and repartitioning cannot change a row. */
  def resize(media: Dataset[MediaRow], tw: Int, th: Int, partitions: Int): Dataset[ResizedMedia] = {
    require(tw > 0 && th > 0, s"target dims must be positive: ${tw}x$th")
    val spark = media.sparkSession
    import spark.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(_.map { row =>
        // zero/negative hints would divide-by-zero inside the task;
        // fail with the offending row named, not an ArithmeticException
        require(row.meta.widthHint > 0 && row.meta.heightHint > 0,
          s"media_id=${row.media_id}: non-positive dimension hints " +
            s"${row.meta.widthHint}x${row.meta.heightHint}")
        val n = row.payload.length
        // BigInt intermediate: n·tw·th overflows Long for large target
        // dims; outLen is ≤ n so the final value always fits an Int
        val ideal = (BigInt(n) * tw * th /
          (BigInt(row.meta.widthHint) * row.meta.heightHint)).min(BigInt(n)).toLong
        val outLen = math.max(1L, ideal).toInt
        ResizedMedia(row.media_id, tw, th, n.toLong, outLen.toLong,
          java.util.Arrays.copyOf(row.payload, outLen))
      })
  }

  /** Frame sampling stub for video payloads: every k-th 4 KB block
    * stands in for a frame; emits (media_id, frame_idx, frame_bytes) —
    * the schema a real ffmpeg-backed sampler would produce. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.mediaType == "video")
      .flatMap { row =>
        val blocks = row.payload.grouped(4096).toSeq
        blocks.zipWithIndex.collect {
          case (block, idx) if idx % everyK == 0 => (row.media_id, idx, block)
        }
      }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  final case class AudioWindow(media_id: Long, win_idx: Long,
                               n_samples: Long, energy: Long,
                               is_silence: Boolean)

  /** Audio energy windowing stub: the payload bytes stand in for 8-bit
    * PCM samples; per fixed-size window the energy is the exact integer
    * Σ(b − zero)² (zero = the codec's DC offset), and a window is
    * "silence" when energy < threshold·n_samples — the segmentation a
    * real VAD/loudness pass produces (schema and batching identical; a
    * resampling decoder drops in at the same boundary). Pure function
    * of the bytes — task retries and repartitioning cannot change a
    * row — and emits only (idx, energy) rows, never the samples. */
  def audioEnergy(media: Dataset[MediaRow], window: Int, zero: Int,
                  silenceThreshold: Long, partitions: Int): Dataset[AudioWindow] = {
    require(window > 0, s"window must be positive: $window")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.mediaType == "audio")
      .repartition(partitions, col("media_id"))
      .flatMap { row =>
        row.payload.grouped(window).zipWithIndex.map { case (chunk, idx) =>
          var e = 0L
          var j = 0
          while (j < chunk.length) {
            val d = (chunk(j) & 0xff) - zero
            e += d.toLong * d
            j += 1
          }
          AudioWindow(row.media_id, idx.toLong, chunk.length.toLong, e,
            e < silenceThreshold * chunk.length)
        }
      }
  }

  final case class FrameHist(media_id: Long, frame_idx: Long, n_bytes: Long,
                             hist: Array[Long])

  /** Per-frame byte-value histograms for video payloads: every block
    * (the q47 frame convention, caller-sized stride) reduced to a B-bucket
    * histogram of byte % B — the compact per-frame signature a
    * scene-change detector consumes (a real pipeline would histogram
    * decoded luma; the bucketing contract and shapes are identical).
    * Emits B longs per frame, never the frame bytes. */
  def frameHistograms(media: Dataset[MediaRow], buckets: Int,
                      frameBytes: Int = 4096): Dataset[FrameHist] = {
    require(buckets > 0 && frameBytes > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.mediaType == "video")
      .flatMap { row =>
        row.payload.grouped(frameBytes).zipWithIndex.map { case (block, idx) =>
          val h = new Array[Long](buckets)
          var j = 0
          while (j < block.length) {
            h((block(j) & 0xff) % buckets) += 1
            j += 1
          }
          FrameHist(row.media_id, idx.toLong, block.length.toLong, h)
        }
      }
  }

  /** Synthetic media table for tests/demo: payload bytes derived from
    * the id (deterministic). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val mediaType = Seq("image", "audio", "video")(i.toInt % 3)
      val size = 2048 + (i.toInt % 5) * 4096
      val payload = Array.tabulate[Byte](size)(j => ((i * 131 + j * 7) % 251).toByte)
      MediaRow(i, MediaMeta(mediaType, 640, 480, 16000), payload)
    }
  }
}
