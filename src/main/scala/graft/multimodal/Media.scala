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

  /** REAL image decoder riding the same [[Decoder]] seam — proof the
    * mapPartitions boundary holds for a genuine library, not just the
    * stub. Uses the JDK's own codec (`javax.imageio`, PNG/JPEG/GIF/BMP
    * — no external dependency): dimensions come from the DECODED
    * bitmap (metadata hints are ignored — a real decoder trusts the
    * bytes), the feature vector is the mean luma of `featureDim`
    * horizontal bands (deterministic: integer pixel sums, one float
    * divide at the end), and the checksum stays CRC32-of-payload so
    * stub and real rows remain comparable. Undecodable bytes fail with
    * the row named — opting into a real decoder asserts the payloads
    * really are encoded images. Opt-in via `spark.graft.media.decoder`
    * = `imageio` ([[decoderFor]]); the gate default stays [[StubDecoder]]
    * (this sandbox's corpus carries text bytes, not PNGs). */
  final class ImageIoDecoder(featureDim: Int = 8) extends Decoder {
    override def decode(row: MediaRow): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
      require(img != null,
        s"media_id=${row.media_id}: payload is not a decodable image (${row.payload.length} bytes)")
      val (w, h) = (img.getWidth, img.getHeight)
      val bands = math.min(featureDim, h)
      val feat = new Array[Float](featureDim)
      var b = 0
      while (b < bands) {
        val y0 = h.toLong * b / bands
        val y1 = h.toLong * (b + 1) / bands
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y.toInt)
            // integer luma (ITU-R 601 weights scaled by 256): exact,
            // so the feature is deterministic across JVMs
            sum += (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
            n += 1
            x += 1
          }
          y += 1
        }
        feat(b) = if (n == 0) 0f else sum.toFloat / (n * 255f)
        b += 1
      }
      val crc = new java.util.zip.CRC32()
      crc.update(row.payload)
      MediaFeatures(row.media_id, row.meta.mediaType, row.payload.length.toLong,
        crc.getValue, w, h, 1, feat)
    }
  }

  /** Decoder selection — the opt-in flag for the real codec path.
    * `spark.graft.media.decoder`: `stub` (default, the gate path) or
    * `imageio` (JDK codec, [[ImageIoDecoder]]). */
  def decoderFor(spark: SparkSession, featureDim: Int = 8): Decoder =
    spark.conf.get("spark.graft.media.decoder", "stub") match {
      case "stub" => new StubDecoder(featureDim)
      case "imageio" => new ImageIoDecoder(featureDim)
      case other => throw new IllegalArgumentException(
        s"spark.graft.media.decoder=$other (expected stub | imageio)")
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

  /** REAL image resize through the same typed boundary as [[resize]]:
    * decode with the JDK codec, area-scale onto a `tw`×`th` canvas
    * (bilinear), re-encode as PNG. Identical schema and partitioning
    * to the stub — a library resizer drops in at exactly this seam.
    * `n_bytes_out` is the real re-encoded size (unlike the stub's
    * prefix rule, a codec's output size is its own). */
  def resizeImageIo(media: Dataset[MediaRow], tw: Int, th: Int,
                    partitions: Int): Dataset[ResizedMedia] = {
    require(tw > 0 && th > 0, s"target dims must be positive: ${tw}x$th")
    val spark = media.sparkSession
    import spark.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(_.map { row =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
        require(img != null,
          s"media_id=${row.media_id}: payload is not a decodable image")
        val out = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        val bytes = bos.toByteArray
        ResizedMedia(row.media_id, tw, th, row.payload.length.toLong,
          bytes.length.toLong, bytes)
      })
  }

  /** REAL WAV audio energy through the same windowing contract as
    * [[audioEnergy]]: parse the RIFF/WAVE payload with the JDK's
    * `javax.sound.sampled`, walk the 16-bit PCM samples, and emit the
    * identical [[AudioWindow]] schema — energy = exact Σs² per
    * `window`-sample window (s the signed 16-bit sample), silence when
    * energy < threshold·n_samples. A resampling/VAD library drops in
    * at this boundary; the q184 gate face stays on the byte stub. */
  def audioEnergyWav(media: Dataset[MediaRow], window: Int,
                     silenceThreshold: Long, partitions: Int): Dataset[AudioWindow] = {
    require(window > 0, s"window must be positive: $window")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.mediaType == "audio")
      .repartition(partitions, col("media_id"))
      .flatMap { row =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"media_id=${row.media_id}: expected 16-bit signed PCM WAV, got $fmt")
        val bytes = in.readAllBytes()
        val le = !fmt.isBigEndian
        val nCh = fmt.getChannels
        // mono-fold multi-channel by taking channel 0 (deterministic)
        val nSamples = bytes.length / (2 * nCh)
        Iterator.range(0, nSamples, window).map { start =>
          val end = math.min(start + window, nSamples)
          var e = 0L
          var i = start
          while (i < end) {
            val off = i * 2 * nCh
            val s =
              if (le) ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
              else ((bytes(off) << 8) | (bytes(off + 1) & 0xff)).toShort
            e += s.toLong * s
            i += 1
          }
          val n = (end - start).toLong
          AudioWindow(row.media_id, (start / window).toLong, n, e,
            e < silenceThreshold * n)
        }
      }
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
