package graft.ingest

import graft.core._
import graft.core.RecordProcessor._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** The ingestion DAG (reference §3.1-§3.3), Spark-shaped:
  *
  *   driver: catalog (S1-S4,F1) + ensureTables (W3 analogue)
  *   executors: one task per file — open, decrypt (E4), gunzip (E5),
  *     read lines (S5), full record chain (T1-T8, E6, K1-K5) — a single
  *     narrow mapPartitions, no shuffle
  *   sinks: versioned-cell table sink with existence anti-join (F5,
  *     W1-W2) and per-file manifest CSVs (W4-W5), forked off one cached
  *     Dataset (run-mode gate W6); counters via accumulators (W7)
  *
  * Scale shape: encrypted+gzipped inputs are not splittable, so
  * partition-per-file is the parallelism unit exactly like the
  * reference's thread-per-file — but scheduled across every executor
  * core in the cluster instead of 10 threads. No shuffle touches record
  * bodies except the manifest regroup (file-sized, tiny) and the
  * anti-join (key+version only when the sink needs it).
  */
object IngestPipeline {

  /** Work item shipped to executors: everything a task needs to decode
    * one file without further driver round-trips. */
  final case class FileTask(dataPath: String,
                            database: String,
                            collection: String,
                            fileNumber: Int,
                            fileIv: String,
                            fileKeyPlain: String)

  /** One processed (or skipped) line. */
  final case class IngestedRow(dataPath: String,
                               lineNo: Long,
                               database: String,
                               collection: String,
                               tableName: String,
                               manifestFileName: String,
                               status: String,
                               rowkey: Array[Byte],
                               version: Long,
                               envelope: String,
                               innerType: String,
                               manifestLine: String,
                               filterStatus: String)

  object Status {
    val Ok = "ok"
    val MissingId = "skipped_missing_id"
    val Malformed = "skipped_malformed"
  }

  /** IV strategy for the per-record re-encrypt (E6). Production =
    * SecureRandom (reference semantics); tests/replay-determinism =
    * per-line derived IVs so task retries regenerate identical bytes
    * (SURVEY §7.4 item 4). */
  sealed trait IvStrategy extends Serializable {
    def ivFor(dataPath: String, lineNo: Long): Array[Byte]
  }
  object IvStrategy {
    case object Random extends IvStrategy {
      // SecureRandom.nextBytes is synchronized — one shared instance
      // would serialize every executor thread on the JVM (measured: the
      // whole ingest pipeline bottlenecked on it). One per thread.
      @transient private lazy val rng: ThreadLocal[java.security.SecureRandom] =
        ThreadLocal.withInitial(() => new java.security.SecureRandom())
      def ivFor(dataPath: String, lineNo: Long): Array[Byte] = {
        val iv = new Array[Byte](16); rng.get().nextBytes(iv); iv
      }
    }
    final case class Deterministic(salt: String) extends IvStrategy {
      def ivFor(dataPath: String, lineNo: Long): Array[Byte] =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$salt/$dataPath/$lineNo".getBytes("UTF-8"))
    }
  }

  final case class Counters(filesProcessed: LongAccumulator,
                            recordsProcessed: LongAccumulator,
                            skippedMissingId: LongAccumulator,
                            skippedMalformed: LongAccumulator)
  object Counters {
    def apply(spark: SparkSession): Counters = Counters(
      spark.sparkContext.longAccumulator("filesProcessed"),
      spark.sparkContext.longAccumulator("recordsProcessed"),
      spark.sparkContext.longAccumulator("skippedMissingId"),
      spark.sparkContext.longAccumulator("skippedMalformed"))
  }

  /** Driver step: pair files, apply S4/F1 filters, resolve per-file keys
    * via the key service (E2 decrypt cache applies), parse filenames. */
  def planTasks(spark: SparkSession, prefixes: Seq[String], keys: KeyService,
                maxObjectBytes: Long = 2200000000L): Seq[FileTask] = {
    val pairs = Catalog.withinSizeCap(Catalog.nonEmpty(Catalog.listPairs(spark, prefixes)), maxObjectBytes)
    pairs.flatMap { pair =>
      RecordProcessor.parseFilename(pair.dataPath).map { case (db, coll, n) =>
        val meta = Catalog.readMetadata(spark, pair.metadataPath)
        val plain =
          if (meta.plaintextDatakey.nonEmpty) meta.plaintextDatakey // fixture-style metadata
          else keys.decryptKey(meta.keyEncryptionKeyId, meta.encryptedEncryptionKey)
        FileTask(pair.dataPath, db, coll, n, meta.initialisationVector, plain)
      }
    }
  }

  /** Executor stage: decode + transform every file, one task per file. */
  def ingest(spark: SparkSession,
             tasks: Seq[FileTask],
             keys: KeyService,
             identity: Envelope.RunIdentity,
             timeFilter: TimeFilter = TimeFilter(),
             ivStrategy: IvStrategy = IvStrategy.Random,
             counters: Option[Counters] = None): Dataset[IngestedRow] = {
    import spark.implicits._
    val cs = counters.getOrElse(Counters(spark))
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    // one partition per file: the unit of parallelism for non-splittable inputs
    val taskDs = spark.createDataset(tasks).repartition(math.max(tasks.size, 1))
    taskDs.mapPartitions { it =>
      it.flatMap { task =>
        cs.filesProcessed.add(1)
        val fileKey = keys.batchDataKey()
        val ctx = FileContext(task.database, task.collection, task.fileNumber, fileKey)
        val manifestName = CsvEscape.manifestFileName(task.database, task.collection, task.fileNumber)
        val p = new Path(task.dataPath)
        val fs = p.getFileSystem(hadoopConf.value)
        val raw = fs.open(p)
        val lines = new java.io.BufferedReader(new java.io.InputStreamReader(
          Crypto.decompressingDecryptingStream(raw, task.fileKeyPlain, task.fileIv), "UTF-8"))
        // lazily read to EOF then close — the whole file streams through
        // decrypt∘gunzip∘transform without ever materializing
        Iterator.continually(lines.readLine()).takeWhile { l =>
          if (l == null) { lines.close(); false } else true
        }.zipWithIndex.map { case (line, i) =>
          val lineNo = i.toLong + 1
          val ivSource: () => Array[Byte] = () => ivStrategy.ivFor(task.dataPath, lineNo)
          RecordProcessor.processLine(line, ctx, identity, ivSource) match {
            case Right(pr) =>
              cs.recordsProcessed.add(1)
              IngestedRow(task.dataPath, lineNo, pr.database, pr.collection, pr.tableName, manifestName,
                Status.Ok, pr.rowkey, pr.version, pr.envelope, pr.innerType, pr.manifestLine,
                timeFilter.status(pr.version).toString)
            case Left(SkipReason.MissingId(_)) =>
              cs.skippedMissingId.add(1)
              IngestedRow(task.dataPath, lineNo, task.database, task.collection, "", manifestName,
                Status.MissingId, Array.emptyByteArray, 0L, "", "", "", "")
            case Left(SkipReason.Malformed(_)) =>
              cs.skippedMalformed.add(1)
              IngestedRow(task.dataPath, lineNo, task.database, task.collection, "", manifestName,
                Status.Malformed, Array.emptyByteArray, 0L, "", "", "", "")
          }
        }
      }
    }
  }

  // ------------------------------------------------------------ sinks

  /** Versioned-cell table sink on parquet — the test/CI stand-in for an
    * HBase-like store, same triple (table, key, version) + body. F5
    * existence anti-join keeps re-runs idempotent. Partitioned by table
    * name so per-table reads prune directories at scale. */
  def writeTableSink(rows: Dataset[IngestedRow], sinkDir: String, skipExisting: Boolean = true): Long = {
    val spark = rows.sparkSession
    import spark.implicits._
    val puts = rows
      .filter(r => r.status == Status.Ok && r.filterStatus == "DoNotFilter")
      .map(r => (r.tableName, r.rowkey, r.version, r.envelope.getBytes("UTF-8")))
      .toDF("tableName", "rowkey", "version", "body")
    val fs = new Path(sinkDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (skipExisting && fs.exists(new Path(sinkDir))) {
        val existing = spark.read.parquet(sinkDir).select("tableName", "rowkey", "version")
        // F5: drop cells already present at (table, key, version) —
        // replay/idempotence semantics of HbaseClient.nonExistent
        puts.join(existing, Seq("tableName", "rowkey", "version"), "left_anti")
      } else puts
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode(SaveMode.Append).partitionBy("tableName").parquet(sinkDir)
    n
  }

  /** W4/W5 — one pipe-delimited CSV per input file, named
    * `db.<db>.<uncoalescedCollection>-%06d.csv`, in input line order.
    * Early/late records appear here even though F2 gates them off the
    * table path (golden behavior, UCHistoricDataImporterSpec.kt:129+). */
  def writeManifests(rows: Dataset[IngestedRow], manifestDir: String): Unit = {
    val spark = rows.sparkSession
    import spark.implicits._
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    rows.filter(_.status == Status.Ok)
      .map(r => (r.manifestFileName, r.lineNo, r.manifestLine))
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        (file, it.toSeq.sortBy(_._2).map(_._3).mkString)
      }
      .foreach { case (file, content) =>
        if (content.nonEmpty) {
          val out = new Path(manifestDir, file)
          val fs = out.getFileSystem(hadoopConf.value)
          val os = fs.create(out, true)
          try os.write(content.getBytes("UTF-8")) finally os.close()
        }
      }
  }

  /** W1 — byte-capped batching helper for push-style sinks (an HBase
    * `Table.put(List)` analogue): groups an iterator into batches whose
    * summed payload stays under `maxBytes`, always at least one element
    * per batch (HBaseWriter.kt:214-234). */
  def groupedByBytes[T](elems: Iterator[T], maxBytes: Long)(sizeOf: T => Long): Iterator[Seq[T]] = {
    val underlying = elems.buffered
    new Iterator[Seq[T]] {
      def hasNext: Boolean = underlying.hasNext
      def next(): Seq[T] = {
        val batch = Seq.newBuilder[T]
        var bytes = 0L
        var n = 0
        var done = false
        while (!done && underlying.hasNext) {
          val elemSize = sizeOf(underlying.head)
          if (n == 0 || bytes + elemSize < maxBytes) {
            batch += underlying.next()
            bytes += elemSize
            n += 1
          } else done = true
        }
        batch.result()
      }
    }
  }

  /** Run-mode gate (W6): which sinks to attach. */
  sealed trait RunMode
  object RunMode {
    case object Import extends RunMode
    case object Manifest extends RunMode
    case object ImportAndManifest extends RunMode
  }

  final case class RunResult(put: Long, filesProcessed: Long, recordsProcessed: Long,
                             skippedMissingId: Long, skippedMalformed: Long,
                             tooEarly: Long, tooLate: Long)

  /** Whole job: catalog → decode/transform → both sinks off one cached
    * Dataset (the reference computes the chain once and forks, we do the
    * same via cache). */
  def run(spark: SparkSession,
          inputPrefixes: Seq[String],
          tableSinkDir: String,
          manifestDir: String,
          keys: KeyService,
          identity: Envelope.RunIdentity,
          timeFilter: TimeFilter = TimeFilter(),
          ivStrategy: IvStrategy = IvStrategy.Random,
          runMode: RunMode = RunMode.ImportAndManifest,
          skipExisting: Boolean = true): RunResult = {
    import spark.implicits._
    val counters = Counters(spark)
    val tasks = planTasks(spark, inputPrefixes, keys)
    val rows = ingest(spark, tasks, keys, identity, timeFilter, ivStrategy, Some(counters)).cache()
    try {
      val put =
        if (runMode != RunMode.Manifest) writeTableSink(rows, tableSinkDir, skipExisting)
        else 0L
      if (runMode != RunMode.Import) writeManifests(rows, manifestDir)
      val byFilter = rows.filter(_.status == Status.Ok).groupByKey(_.filterStatus).count().collect().toMap
      RunResult(put,
        counters.filesProcessed.value, counters.recordsProcessed.value,
        counters.skippedMissingId.value, counters.skippedMalformed.value,
        byFilter.getOrElse("FilterTooEarly", 0L), byFilter.getOrElse("FilterTooLate", 0L))
    } finally rows.unpersist()
  }
}
