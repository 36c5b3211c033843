package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.util.Base64

/** Replicates the reference integration stack's golden expectations
  * (UCHistoricDataImporterSpec.kt:129-238) against the same fixture
  * shapes sample_data.py generates: 10 base records + every edge case,
  * compared line-by-line on the manifest CSV, version, inner type and
  * decrypt-back of the cell body.
  */
class RecordProcessorSpec extends AnyFunSuite {
  import RecordProcessor._

  private val keyB64 = Base64.getEncoder.encodeToString(Array.fill[Byte](16)(3))
  private val dataKey = Envelope.DataKeyResult("cloudhsm:1,2", keyB64, "ciphertext-data-key")
  private val identity = Envelope.RunIdentity(
    unitOfWorkId = "fixed-uow", traceId = "fixed-trace", hdiVersion = "test",
    clock = () => new java.util.Date(0L))
  private val fixedIv: () => Array[Byte] = () => Array.tabulate[Byte](16)(_.toByte)

  private def ctx(db: String = "database-1", coll: String = "collection-1", n: Int = 1) =
    FileContext(db, coll, n, dataKey)

  private def baseRecord(declarationId: String, ms: Int): String =
    s"""{"_id": {"someId": "RANDOM_GUID", "declarationId": "$declarationId"}, "type": "addressDeclaration", """ +
    s""""contractId": "c", "postcode": "SM5 2LE", "createdDateTime": {"$$date": "2015-03-20T12:23:25.183Z"}, """ +
    s""""_version": 2, "_lastModifiedDateTime": {"$$date": "2018-12-01T15:01:02.${"%03d".format(ms)}Z"}}"""

  private def process(line: String, c: FileContext = ctx()): Processed =
    processLine(line, c, identity, fixedIv).fold(sk => fail(s"skipped: $sk"), identity2 => identity2)

  private def golden(id: String, version: Long, db: String, coll: String, origId: String, inner: String): String = {
    def q(s: String) = CsvEscape.escapeCsv(s)
    s"${q(id)}|$version|$db|$coll|IMPORT|HDI|${q(origId)}|$inner\n"
  }

  test("base record: golden manifest line, version from lastModified") {
    val p = process(baseRecord("database-1.collection-1.0001-1", 0))
    val sortedId = """{"declarationId":"database-1.collection-1.0001-1","someId":"RANDOM_GUID"}"""
    assert(p.manifestLine == golden(sortedId, 1543676462000L, "database-1", "collection-1", sortedId, "MONGO_IMPORT"))
    assert(p.version == 1543676462000L)
    assert(p.innerType == "MONGO_IMPORT")
  }

  test("ten base records increment version milliseconds like the fixture") {
    (0 until 10).foreach { j =>
      val p = process(baseRecord("database-1.collection-1.0001-1", j))
      assert(p.version == 1543676462000L + j)
    }
  }

  test("mongo-oid id flattens: unquoted manifest id, original id keeps the $oid shape") {
    val line = baseRecord("x", 9).replace(
      """{"someId": "RANDOM_GUID", "declarationId": "x"}""",
      """{"$oid": "database-1.collection-1.0001-1"}""")
    val p = process(line)
    assert(p.manifestLine == golden(
      "database-1.collection-1.0001-1", 1543676462009L, "database-1", "collection-1",
      """{"$oid":"database-1.collection-1.0001-1"}""", "MONGO_IMPORT"))
  }

  test("id with embedded mongo date: inner date flattened in id, original keeps wrapper") {
    val line =
      s"""{"_id": {"someId": "RANDOM_GUID", "declarationId": "d1", "createdDateTime": {"$$date": "2010-01-01T00:00:00.000Z"}},
          "createdDateTime": {"$$date": "2015-03-20T12:23:25.183Z"},
          "_lastModifiedDateTime": {"$$date": "2018-12-01T15:01:02.009Z"}}"""
    val p = process(line)
    assert(p.manifestLine == golden(
      """{"createdDateTime":"2010-01-01T00:00:00.000+0000","declarationId":"d1","someId":"RANDOM_GUID"}""",
      1543676462009L, "database-1", "collection-1",
      """{"createdDateTime":{"$date":"2010-01-01T00:00:00.000Z"},"declarationId":"d1","someId":"RANDOM_GUID"}""",
      "MONGO_IMPORT"))
  }

  test("removed record: MONGO_DELETE, version from _removedDateTime") {
    val inner = baseRecord("d1", 9).dropRight(1) + s""", "_removedDateTime": {"$$date": "2012-03-04T21:43:56.000Z"}}"""
    val p = process(s"""{"_removed": $inner}""")
    assert(p.innerType == "MONGO_DELETE")
    assert(p.version == 1330897436000L)
    assert(p.manifestLine.endsWith("|MONGO_DELETE\n"))
  }

  test("archived record: MONGO_DELETE, version from _archivedDateTime") {
    val inner = baseRecord("d1", 9).dropRight(1) + s""", "_archivedDateTime": {"$$date": "2014-03-02T12:34:56.000Z"}}"""
    val p = process(s"""{"_archived": $inner}""")
    assert(p.innerType == "MONGO_DELETE")
    assert(p.version == 1393763696000L)
  }

  test("no lastModified: version falls back to createdDateTime") {
    val line = baseRecord("d1", 9).replaceAll(""", "_lastModifiedDateTime".*\}\}""", "}")
    val p = process(line)
    assert(p.version == 1426854205183L) // 2015-03-20T12:23:25.183Z
  }

  test("no timestamps at all: version is the 1980 epoch") {
    val line = """{"_id": {"someId": "G", "declarationId": "d1"}, "type": "t"}"""
    val p = process(line)
    assert(p.version == DateFmt.EpochMillis)
    assert(p.manifestLine.contains("|315532800000|"))
  }

  test("early/late records still produce manifest lines (filter gates only the table path)") {
    val early = baseRecord("d1", 0).replace("2018-12-01T15:01:02.000Z", "2000-01-01T12:34:56.000Z")
    val late = baseRecord("d1", 0).replace("2018-12-01T15:01:02.000Z", "2020-06-29T12:34:56.000Z")
    val pe = process(early)
    val pl = process(late)
    val filter = TimeFilter(
      earlierThan = DateFmt.timestampAsLong("2010-01-01T00:00:00.000Z"),
      laterThan = DateFmt.timestampAsLong("2019-12-31T23:59:59.999Z"))
    assert(filter.status(pe.version) == FilterStatus.FilterTooEarly)
    assert(filter.status(pl.version) == FilterStatus.FilterTooLate)
    assert(filter.status(DateFmt.EpochMillis) == FilterStatus.DoNotFilter) // epoch exemption
    assert(pe.manifestLine.nonEmpty && pl.manifestLine.nonEmpty)
  }

  test("coalesced collection: collection-thirtyone reports as collection") {
    val p = process(baseRecord("d1", 0), ctx(coll = "collection-thirtyone"))
    assert(p.collection == "collection")
    assert(p.tableName == "database_1:collection")
    assert(p.manifestLine.contains("|database-1|collection|"))
  }

  test("agent_core agentToDoArchive merges into agentToDo") {
    val p = process(baseRecord("d1", 0), ctx(db = "agent_core", coll = "agentToDoArchive"))
    assert(p.collection == "agentToDo")
    assert(p.tableName == "agent_core:agentToDo")
    assert(p.manifestLine.contains("|agent_core|agentToDo|"))
  }

  test("malformed line (truncated json) is skipped, not fatal") {
    val full = baseRecord("d1", 0)
    val res = processLine(full.take(full.length / 2), ctx(), identity, fixedIv)
    assert(res.swap.exists(_.isInstanceOf[SkipReason.Malformed]))
  }

  test("record with no _id is skipped with MissingId") {
    val res = processLine("""{"type": "t", "x": 1}""", ctx(), identity, fixedIv)
    assert(res.swap.exists(_.isInstanceOf[SkipReason.MissingId]))
  }

  test("rowkey is CRC-prefixed sorted id json over the envelope _id") {
    val p = process(baseRecord("database-1.collection-1.0001-1", 0))
    val sortedId = """{"declarationId":"database-1.collection-1.0001-1","someId":"RANDOM_GUID"}"""
    assert(new String(p.rowkey.drop(4), "UTF-8") == sortedId)
    assert(p.rowkey.take(4).sameElements(Rowkey.fourByteChecksum(sortedId)))
  }

  test("envelope dbObject decrypts back to the transformed record") {
    val p = process(baseRecord("d1", 0))
    val env = Json.parseObject(p.envelope)
    val msg = env.get("message").get.asInstanceOf[JObj]
    val dbObject = msg.get("dbObject").get.asInstanceOf[JStr].value
    val iv = msg.get("encryption").get.asInstanceOf[JObj].get("initialisationVector").get.asInstanceOf[JStr].value
    val decrypted = new String(Crypto.decrypt(keyB64, iv, dbObject), "UTF-8")
    val rec = Json.parseObject(decrypted)
    // dates normalized + flags set in the envelope
    assert(rec.get("_lastModifiedDateTime").contains(JStr("2018-12-01T15:01:02.000+0000")))
    assert(rec.get("createdDateTime").contains(JStr("2015-03-20T12:23:25.183+0000")))
    assert(msg.get("timestamp_created_from").contains(JStr("_lastModifiedDateTimeStripped")))
    assert(msg.get("last_modified_date_time_was_altered").contains(JBool(true)))
    assert(msg.get("created_date_time_was_altered").contains(JBool(true)))
    assert(env.get("@type").contains(JStr("HDI")))
  }

  test("producer-parts fast path ≡ envelope reparse on every fixture shape (incl. id quirks)") {
    // processLine now derives innerType/rowkey/outerType from the parts
    // the envelope producer holds; this pins them to what re-parsing the
    // rendered envelope (the reference's flow) yields, over the full
    // fixture corpus plus the klaxon id quirks (Int-wrap, Long id → no
    // key, object id).
    val quirky = Seq(
      baseRecord("d", 1).replace("""{"someId": "RANDOM_GUID", "declarationId": "d"}""", "12345"),
      baseRecord("d", 1).replace("""{"someId": "RANDOM_GUID", "declarationId": "d"}""", "99999999999"),
      baseRecord("d", 1).replace("""{"someId": "RANDOM_GUID", "declarationId": "d"}""", "\"plain-string\""))
    val corpus = graft.ingest.FixtureDumps.dumpLines("database-1", "collection-1", 1) ++ quirky
    corpus.foreach { line =>
      processLine(line, ctx(), identity, fixedIv).foreach { p =>
        val env = Json.parse(p.envelope)
        assert(Versions.getType(env) == p.innerType, line)
        assert(Rowkey.generateKeyFromEnvelope(env).sameElements(p.rowkey), line)
        env match {
          case o: JObj => assert(o.get("@type").contains(JStr("HDI")), line)
          case other => fail(s"envelope not an object: $other")
        }
      }
    }
  }

  test("escape-sensitive @type values take the reparse route: quote → Malformed, escape → decoded") {
    // @type with an embedded quote renders an invalid envelope — the
    // reparse throws and the record is a Malformed skip, exactly as
    // before the fast path existed
    val quoted = baseRecord("d", 1).replace(""""type": "addressDeclaration"""",
      """"@type": "a\"b"""")
    assert(processLine(quoted, ctx(), identity, fixedIv).left.exists {
      case RecordProcessor.SkipReason.Malformed(_) => true; case _ => false
    })
    // @type with a backslash escape: the reparse DECODES it (\\b →
    // backspace) — innerType must be the decoded form, matching what
    // Versions.getType on the envelope yields
    val escaped = baseRecord("d", 1).replace(""""type": "addressDeclaration"""",
      """"@type": "a\\b"""")
    val p = process(escaped)
    assert(Versions.getType(Json.parse(p.envelope)) == p.innerType)
  }

  test("escape-sensitive lastModified takes the reparse route: date+quote junk → Malformed") {
    // A _lastModifiedDateTime string with a lenient-parseable date prefix
    // followed by a raw quote: the version parse succeeds (SimpleDateFormat
    // ignores trailing garbage) but the envelope splice would be invalid
    // JSON. The reference reparses every envelope (MessageUtils.kt:43-77)
    // and throws → F4 Malformed skip; the fast-path guard must match.
    val junkDate = baseRecord("d", 0).replace(
      """"_lastModifiedDateTime": {"$date": "2018-12-01T15:01:02.000Z"}""",
      """"_lastModifiedDateTime": "2018-12-01T15:01:02.000Z\"junk"""")
    assert(junkDate != baseRecord("d", 0), "fixture replace must hit")
    assert(processLine(junkDate, ctx(), identity, fixedIv).left.exists {
      case RecordProcessor.SkipReason.Malformed(_) => true; case _ => false
    })
  }

  test("filename parse extracts db/collection/filenumber, case-insensitive, path-prefixed") {
    assert(parseFilename("some/prefix/database-1.collection-1.0001.json.gz.enc")
      .contains(("database-1", "collection-1", 1)))
    assert(parseFilename("agent_core.agentToDoArchive.0002.JSON.GZ.ENC")
      .contains(("agent_core", "agentToDoArchive", 2)))
    assert(parseFilename("not-a-dump.txt").isEmpty)
  }
}
