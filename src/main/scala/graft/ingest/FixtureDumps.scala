package graft.ingest

import graft.core.Crypto
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path => JPath}
import java.util.Base64
import java.util.zip.GZIPOutputStream

/** Deterministic dump-file fixture generation: the same record shapes
  * the reference integration stack's sample_data.py emits (10 base
  * records plus every edge case), gzipped then AES-CTR encrypted with a
  * FIXED key and IV, with sibling encryption metadata. Lives in main
  * scope because the q30 end-to-end correctness query regenerates these
  * dumps at verify time; the test Fixtures delegate here so the specs
  * and the correctness gate exercise byte-identical inputs. */
object FixtureDumps {

  val fileKeyB64: String = Base64.getEncoder.encodeToString(Array.tabulate[Byte](16)(i => (i + 1).toByte))

  def baseRecord(declarationId: String, ms: Int): String =
    s"""{"_id": {"someId": "RANDOM_GUID", "declarationId": "$declarationId"}, "type": "addressDeclaration", """ +
    s""""postcode": "SM5 2LE", "createdDateTime": {"$$date": "2015-03-20T12:23:25.183Z"}, """ +
    s""""_version": 2, "_lastModifiedDateTime": {"$$date": "2018-12-01T15:01:02.${"%03d".format(ms)}Z"}}"""

  /** 10 base + 10 edge-case lines (sample_data.py -gjfvbarcedimotk). */
  def dumpLines(db: String, coll: String, n: Int): Seq[String] = {
    val decl = s"$db.$coll.${"%04d".format(n)}-1"
    val base = (0 until 10).map(j => baseRecord(decl, j))
    val full = baseRecord(decl, 9)
    val malformed = full.take(full.length / 2)
    val mongoId = full.replace(s"""{"someId": "RANDOM_GUID", "declarationId": "$decl"}""", s"""{"$$oid": "$decl"}""")
    val noId = full.replace(s""""_id": {"someId": "RANDOM_GUID", "declarationId": "$decl"}, """, "")
    val innerDateId = full.replace(
      s"""{"someId": "RANDOM_GUID", "declarationId": "$decl"}""",
      s"""{"someId": "RANDOM_GUID", "declarationId": "$decl", "createdDateTime": {"$$date": "2010-01-01T00:00:00.000Z"}}""")
    val removed = s"""{"_removed": ${full.dropRight(1) + s""", "_removedDateTime": {"$$date": "2012-03-04T21:43:56.000Z"}}"""}}"""
    val archived = s"""{"_archived": ${full.dropRight(1) + s""", "_archivedDateTime": {"$$date": "2014-03-02T12:34:56.000Z"}}"""}}"""
    val noTimestamp = full.replaceAll(""", "_lastModifiedDateTime".*\}\}$""", "}")
    val early = full.replace("2018-12-01T15:01:02.009Z", "2000-01-01T12:34:56.000Z")
    val late = full.replace("2018-12-01T15:01:02.009Z", "2020-06-29T12:34:56.000Z")
    val noTimestamps = noTimestamp.replace(""""createdDateTime": {"$date": "2015-03-20T12:23:25.183Z"}, """, "")
    base ++ Seq(malformed, mongoId, noId, innerDateId, removed, archived, noTimestamp, early, late, noTimestamps)
  }

  def writeDumpFile(dir: JPath, db: String, coll: String, n: Int): Unit = {
    val content = dumpLines(db, coll, n).mkString("", "\n", "\n")
    val gz = new ByteArrayOutputStream()
    val go = new GZIPOutputStream(gz)
    go.write(content.getBytes("UTF-8")); go.close()
    val enc = Crypto.encrypt(fileKeyB64, gz.toByteArray, () => Array.tabulate[Byte](16)(i => (i * 7).toByte))
    val stem = s"$db.$coll.${"%04d".format(n)}.json"
    Files.write(dir.resolve(s"$stem.gz.enc"), Base64.getDecoder.decode(enc.encrypted))
    val meta =
      s"""{"keyEncryptionKeyId": "stub:1,2", "plaintextDatakey": "$fileKeyB64",
          "encryptedEncryptionKey": "unused", "initialisationVector": "${enc.initialisationVector}"}"""
    Files.write(dir.resolve(s"$stem.encryption.json"), meta.getBytes("UTF-8"))
  }
}
