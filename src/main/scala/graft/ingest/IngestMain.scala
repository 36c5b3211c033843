package graft.ingest

import graft.core.{DateFmt, Envelope}
import graft.core.RecordProcessor.TimeFilter
import org.apache.spark.sql.SparkSession

/** The whole-job entry point — the `spark-submit` face of the engine,
  * accepting the reference's configuration surface as `key=value` args
  * (reference property names, JobConfiguration.kt /
  * application.properties):
  *
  *   input.prefixes        comma-separated input dirs/URIs   (s3.prefix.folder + suffixes)
  *   table.sink.dir        versioned-cell sink location      (HBase stand-in)
  *   table.sink.impl       parquet (default) | filestore — filestore runs
  *                         the real push path (PushTableSink: driver DDL,
  *                         byte-capped batches, bounded retry, per-batch
  *                         existence skip) against a durable FileStore
  *   manifest.dir          manifest output                   (s3.manifest.prefix.folder)
  *   run-mode              import | manifest | import_and_manifest (default)
  *   skip.existing.records true|false (default true)         (F5)
  *   skip.earlier.than     ISO date-time, optional           (F2 lower bound)
  *   skip.later.than       ISO date-time, optional           (F2 upper bound)
  *   object.maximum.size   bytes, default 2200000000         (F1)
  *   dks.url               key-service URL; absent → fixture-mode
  *                         (plaintext keys from *.encryption.json)
  *   correlation.id        traceId for the envelope
  *   hdi.version           envelope version string
  *
  * Example:
  *   spark-submit --class graft.ingest.IngestMain <jar> \
  *     input.prefixes=s3a://bucket/dumps table.sink.dir=s3a://bucket/cells \
  *     manifest.dir=s3a://bucket/manifests skip.earlier.than=2010-01-01T00:00:00.000Z
  */
object IngestMain {

  def main(args: Array[String]): Unit = {
    val conf: Map[String, String] =
      args.filter(_.contains("=")).map { a =>
        val i = a.indexOf('=')
        a.take(i) -> a.drop(i + 1)
      }.toMap

    def required(k: String): String =
      conf.getOrElse(k, throw new IllegalArgumentException(s"missing required arg $k=<value>"))

    // validate before building a session so bad invocations fail fast
    val inputPrefixes = required("input.prefixes").split(',').toSeq
    val tableSinkDir = required("table.sink.dir")
    val manifestDir = required("manifest.dir")

    // under spark-submit we own the session; under tests we reuse (and
    // must not stop) the caller's
    val preExisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = SparkSession.builder()
      .appName("graft-ingest")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val runMode = conf.getOrElse("run-mode", "import_and_manifest") match {
        case "import" => IngestPipeline.RunMode.Import
        case "manifest" => IngestPipeline.RunMode.Manifest
        case _ => IngestPipeline.RunMode.ImportAndManifest
      }
      val timeFilter = TimeFilter(
        earlierThan = conf.get("skip.earlier.than").map(DateFmt.timestampAsLong).getOrElse(Long.MinValue),
        laterThan = conf.get("skip.later.than").map(DateFmt.timestampAsLong).getOrElse(Long.MaxValue))
      val keys: KeyService = conf.get("dks.url") match {
        case Some(url) => HttpKeyService(url)
        case None => StubKeyService()
      }
      val identity = Envelope.RunIdentity.live(
        traceId = conf.getOrElse("correlation.id", "NOT_SET"),
        hdiVersion = conf.getOrElse("hdi.version", "graft"))
      // X3: every structured log line of this run carries the id
      graft.core.JsonLog.correlationId = conf.getOrElse("correlation.id", graft.core.JsonLog.UnsetText)
      graft.core.JsonLog.info("IngestMain", "Starting import",
        "input_prefixes" -> inputPrefixes.mkString(","), "run_mode" -> conf.getOrElse("run-mode", "import_and_manifest"))

      val result = IngestPipeline.run(spark,
        inputPrefixes = inputPrefixes,
        tableSinkDir = tableSinkDir,
        manifestDir = manifestDir,
        keys = keys,
        identity = identity,
        timeFilter = timeFilter,
        runMode = runMode,
        skipExisting = conf.getOrElse("skip.existing.records", "true").toBoolean,
        maxObjectBytes = conf.get("object.maximum.size").map(_.toLong).getOrElse(2200000000L),
        pushStore = conf.getOrElse("table.sink.impl", "parquet") match {
          case "filestore" => Some(() => FileStore(tableSinkDir))
          case _ => None
        })

      // the reference's end-of-run counter log (HBaseWriter.kt:309-318)
      println(s"""{"files": ${result.filesProcessed}, "records": ${result.recordsProcessed}, """ +
        s""""put": ${result.put}, "skipped_missing_id": ${result.skippedMissingId}, """ +
        s""""skipped_malformed": ${result.skippedMalformed}, "too_early": ${result.tooEarly}, """ +
        s""""too_late": ${result.tooLate}, "unreadable_files": ${result.unreadableFiles}, """ +
        s""""filtered_existing": ${result.filteredExisting}}""")
      graft.core.JsonLog.info("IngestMain", "Import complete",
        "files" -> result.filesProcessed.toString, "records" -> result.recordsProcessed.toString,
        "put" -> result.put.toString, "unreadable_files" -> result.unreadableFiles.toString)
    } finally if (preExisting.isEmpty) spark.stop()
  }
}
