package graft.streaming

import graft.core.{Crypto, Envelope, RecordProcessor}
import graft.ingest.{Catalog, IngestPipeline, KeyService}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming file-arrival ingestion: the core record engine driven by
  * Structured Streaming's file source instead of a one-shot catalog.
  * New `*.json.gz.enc` dumps landing under the watched prefix are
  * decoded and transformed exactly like the batch path (same
  * RecordProcessor chain), with the stream giving exactly-once file
  * processing via the source's checkpoint log.
  *
  * Uses `format("binaryFile")`, so one input file is one row (content
  * in memory): the right shape for steady dump-feed ingestion of
  * normal-size files; a multi-GB dump belongs on the batch path (the
  * reference's 2.2 GB size cap applies here with the same constant).
  *
  * Scale shape: `maxFilesPerTrigger` bounds a micro-batch; each file
  * decodes independently (narrow), and sinks are idempotent per
  * (key, version), so replayed triggers are safe — the same
  * determinism argument as batch task retry.
  */
object StreamingIngest {

  /** Start reading dump files as a stream of decoded records. The
    * metadata sidecars are resolved per file at decode time (driver
    * lists only once per micro-batch trigger). */
  def records(spark: SparkSession,
              inputDir: String,
              keys: KeyService,
              identity: Envelope.RunIdentity,
              maxFilesPerTrigger: Int = 16): Dataset[IngestPipeline.IngestedRow] = {
    import spark.implicits._
    // ship the session's Hadoop configuration to the decode tasks so the
    // sidecar read resolves the same filesystems (s3a credentials,
    // endpoints, custom schemes) as every other executor-side read
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val files = spark.readStream
      .format("binaryFile")
      // the binaryFile source's fixed schema — streaming sources require
      // it stated explicitly
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.json.gz.enc")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(inputDir)
      .select(col("path"), col("content"))
    files.as[(String, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (path, content) =>
        RecordProcessor.parseFilename(path).iterator.flatMap { case (db, coll, n) =>
          val metaPath = path.replaceFirst("\\.gz\\.enc$", ".encryption.json")
          val meta = Catalog.readMetadata(metaPath, hadoopConf.value)
          val plain =
            if (meta.plaintextDatakey.nonEmpty) meta.plaintextDatakey
            else keys.decryptKey(meta.keyEncryptionKeyId, meta.encryptedEncryptionKey)
          val fileKey = keys.batchDataKey()
          val ctx = RecordProcessor.FileContext(db, coll, n, fileKey)
          val manifestName = graft.core.CsvEscape.manifestFileName(db, coll, n)
          val in = Crypto.decompressingDecryptingStream(
            new java.io.ByteArrayInputStream(content), plain, meta.initialisationVector)
          val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
          Iterator.continually(reader.readLine()).takeWhile { l =>
            if (l == null) { reader.close(); false } else true
          }.zipWithIndex.map { case (line, i) =>
            val lineNo = i.toLong + 1
            RecordProcessor.processLine(line, ctx, identity,
              () => IngestPipeline.IvStrategy.Random.ivFor(path, lineNo)) match {
              case Right(pr) =>
                IngestPipeline.IngestedRow(path, lineNo, pr.database, pr.collection, pr.tableName,
                  manifestName, IngestPipeline.Status.Ok, pr.rowkey, pr.version, pr.envelope,
                  pr.innerType, pr.manifestLine, "DoNotFilter", "")
              case Left(RecordProcessor.SkipReason.MissingId(_)) =>
                IngestPipeline.IngestedRow(path, lineNo, db, coll, "", manifestName,
                  IngestPipeline.Status.MissingId, Array.emptyByteArray, 0L, "", "", "", "", "")
              case Left(RecordProcessor.SkipReason.Malformed(_)) =>
                IngestPipeline.IngestedRow(path, lineNo, db, coll, "", manifestName,
                  IngestPipeline.Status.Malformed, Array.emptyByteArray, 0L, "", "", "", "", "")
            }
          }
        }
      }
    }
  }

}
