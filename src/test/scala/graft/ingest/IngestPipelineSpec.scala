package graft.ingest

import graft.core._
import graft.ingest.IngestPipeline._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path => JPath}
import java.util.Base64
import java.util.zip.GZIPOutputStream

/** End-to-end replica of the reference integration spec
  * (UCHistoricDataImporterSpec.kt): generate the same dump-file shapes
  * sample_data.py produces (gzipped then AES-CTR encrypted NDJSON with
  * sibling encryption metadata), run the whole pipeline on Spark, and
  * assert table-sink contents, decrypt-back, manifest names/contents,
  * and idempotent re-runs.
  */
class IngestPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var tmp: JPath = _

  private val fileKeyB64 = Fixtures.fileKeyB64
  private val identity = Envelope.RunIdentity("uow", "trace", "test", () => new java.util.Date(0L))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("ingest-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tmp = Files.createTempDirectory("graft-ingest")
    Fixtures.writeDumpFile(tmp, "database-1", "collection-1", 1)
    Fixtures.writeDumpFile(tmp, "database-1", "collection-thirtyone", 1)
    Fixtures.writeDumpFile(tmp, "agent_core", "agentToDoArchive", 1)
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
  }

  // fixtures shared with IngestMainSpec — see Fixtures.scala

  private def runJob(skipExisting: Boolean = true): RunResult =
    IngestPipeline.run(spark,
      Seq(tmp.toString),
      tmp.resolve("table-sink").toString,
      tmp.resolve("manifests").toString,
      StubKeyService(),
      identity,
      timeFilter = RecordProcessor.TimeFilter(
        earlierThan = DateFmt.timestampAsLong("2010-01-01T00:00:00.000Z"),
        laterThan = DateFmt.timestampAsLong("2019-12-31T23:59:59.999Z")),
      ivStrategy = IvStrategy.Deterministic("spec"),
      skipExisting = skipExisting)

  // ------------------------------------------------------------- tests

  test("end-to-end: counts, tables, manifest files, idempotent re-run") {
    val r1 = runJob()
    assert(r1.filesProcessed == 3)
    assert(r1.recordsProcessed == 3 * 18) // 20 lines/file minus malformed + no-id
    assert(r1.skippedMalformed == 3)
    assert(r1.skippedMissingId == 3)
    assert(r1.tooEarly == 3 && r1.tooLate == 3)
    assert(r1.put == 3 * 16) // 18 ok minus early minus late

    val sink = spark.read.parquet(tmp.resolve("table-sink").toString)
    val tables = sink.select("tableName").distinct().collect().map(_.getString(0)).toSet
    assert(tables == Set("database_1:collection_1", "database_1:collection", "agent_core:agentToDo"))
    assert(sink.count() == 48)

    // golden manifest names (UCHistoricDataImporterSpec.kt:223-238)
    val manifests = new java.io.File(tmp.resolve("manifests").toString).listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).toSet // drop Hadoop .crc sidecars
    assert(manifests == Set(
      "db.database-1.collection-1-000001.csv",
      "db.database-1.collection-thirtyone-000001.csv",
      "db.agent_core.agentToDoArchive-000001.csv"))

    // 18 lines per manifest incl. the filtered-out early/late records
    manifests.foreach { f =>
      val lines = Files.readAllLines(tmp.resolve("manifests").resolve(f))
      assert(lines.size == 18, s"manifest $f")
    }

    // golden first line of the plain-collection manifest
    val first = Files.readAllLines(tmp.resolve("manifests").resolve("db.database-1.collection-1-000001.csv")).get(0)
    assert(first ==
      "\"{\"\"declarationId\"\":\"\"database-1.collection-1.0001-1\"\",\"\"someId\"\":\"\"RANDOM_GUID\"\"}\"|1543676462000|database-1|collection-1|IMPORT|HDI|" +
      "\"{\"\"declarationId\"\":\"\"database-1.collection-1.0001-1\"\",\"\"someId\"\":\"\"RANDOM_GUID\"\"}\"|MONGO_IMPORT")

    // coalesced manifest rows report the coalesced collection name
    val coalesced = Files.readAllLines(tmp.resolve("manifests").resolve("db.database-1.collection-thirtyone-000001.csv")).get(0)
    assert(coalesced.contains("|database-1|collection|"))

    // re-run: existence anti-join drops every cell (F5 idempotence)
    val r2 = runJob()
    assert(r2.put == 0)
    assert(r2.filteredExisting == 3 * 16) // every writable cell already present
    assert(r1.filteredExisting == 0)
    assert(spark.read.parquet(tmp.resolve("table-sink").toString).count() == 48)
  }

  test("cells decrypt back to the transformed record (integration spec :84-127)") {
    val sink = spark.read.parquet(tmp.resolve("table-sink").toString)
    val row = sink.filter(sink("tableName") === "agent_core:agentToDo").select("body").head()
    val envelope = new String(row.getAs[Array[Byte]]("body"), "UTF-8")
    val env = Json.parseObject(envelope)
    val msg = env.get("message").get.asInstanceOf[JObj]
    assert(msg.get("db").contains(JStr("agent_core")))
    assert(msg.get("collection").contains(JStr("agentToDo")))
    val dbObject = msg.get("dbObject").get.asInstanceOf[JStr].value
    val iv = msg.get("encryption").get.asInstanceOf[JObj].get("initialisationVector").get.asInstanceOf[JStr].value
    val batchKey = StubKeyService().batchDataKey().plaintextDataKey
    val record = Json.parseObject(new String(Crypto.decrypt(batchKey, iv, dbObject), "UTF-8"))
    assert(record.has("_id"))
    assert(record.get("postcode").contains(JStr("SM5 2LE")))
  }

  test("versions become cell timestamps: base records carry incrementing millis") {
    val sink = spark.read.parquet(tmp.resolve("table-sink").toString)
    val versions = sink.filter(sink("tableName") === "database_1:collection_1")
      .select("version").collect().map(_.getLong(0)).toSet
    (0 until 10).foreach(j => assert(versions.contains(1543676462000L + j)))
    assert(versions.contains(1330897436000L)) // removed
    assert(versions.contains(1393763696000L)) // archived
    assert(versions.contains(DateFmt.EpochMillis)) // no timestamps at all
  }

  test("undecodable files skip with marker rows instead of failing the run (per-file continue)") {
    val dir = Files.createTempDirectory("graft-ingest-bad")
    Fixtures.writeDumpFile(dir, "database-1", "collection-1", 1)
    def meta: String =
      s"""{"keyEncryptionKeyId": "k", "plaintextDatakey": "$fileKeyB64", """ +
        s""""encryptedEncryptionKey": "e", "initialisationVector": "${Base64.getEncoder.encodeToString(new Array[Byte](16))}"}"""
    // garbage bytes: AES-CTR "decrypts" them, gzip rejects the magic
    Files.write(dir.resolve("bad-db.garbage-coll.0001.json.gz.enc"), Array.tabulate[Byte](64)(_.toByte))
    Files.write(dir.resolve("bad-db.garbage-coll.0001.json.encryption.json"), meta.getBytes("UTF-8"))
    // zero-byte data with live metadata passes S4 (only both-empty pairs
    // drop) and dies in the GZIP header read — the classic poison file
    Files.write(dir.resolve("bad-db.empty-coll.0001.json.gz.enc"), Array.emptyByteArray)
    Files.write(dir.resolve("bad-db.empty-coll.0001.json.encryption.json"), meta.getBytes("UTF-8"))

    val r = IngestPipeline.run(spark, Seq(dir.toString),
      dir.resolve("sink").toString, dir.resolve("manifests").toString,
      StubKeyService(), identity, ivStrategy = IvStrategy.Deterministic("bad"))
    assert(r.filesProcessed == 3)
    assert(r.unreadableFiles == 2)
    assert(r.recordsProcessed == 18) // the good file decodes fully
    assert(r.put == 18)
  }

  test("groupedByBytes batches under the cap with at least one element each (W1)") {
    val items = Seq.fill(10)("x" * 30)
    val batches = IngestPipeline.groupedByBytes(items.iterator, 100L)(_.length.toLong).toSeq
    assert(batches.flatten == items)
    assert(batches.forall(_.nonEmpty))
    assert(batches.forall(b => b.map(_.length).sum <= 120))
    val single = IngestPipeline.groupedByBytes(Seq("oversized-element").iterator, 1L)(_.length.toLong).toSeq
    assert(single == Seq(Seq("oversized-element")))
  }
}
