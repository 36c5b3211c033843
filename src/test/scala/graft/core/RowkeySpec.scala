package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Mirrors MessageUtilsTest.kt:51-96,138-253,305-324 — rowkey
  * determinism under key order / whitespace, 4-byte checksum prefix,
  * case-sensitive sort, type-sensitive inequality. */
class RowkeySpec extends AnyFunSuite {

  private def envelopeWith(idJson: String): JValue =
    Json.parse(s"""{"message": {"_id": $idJson}}""")

  test("identical ids regardless of key order produce identical keys") {
    val k1 = Rowkey.generateKeyFromEnvelope(envelopeWith("""{"a": 1, "b": "2"}"""))
    val k2 = Rowkey.generateKeyFromEnvelope(envelopeWith("""{"b": "2", "a": 1}"""))
    assert(k1.sameElements(k2))
  }

  test("identical ids regardless of whitespace produce identical keys") {
    val k1 = Rowkey.generateKeyFromEnvelope(envelopeWith("""{"a":1,"b":"2"}"""))
    val k2 = Rowkey.generateKeyFromEnvelope(envelopeWith("""{ "a" : 1 ,   "b" :  "2" }"""))
    assert(k1.sameElements(k2))
  }

  test("key is 4-byte checksum prefix + sorted compact json bytes") {
    val key = Rowkey.generateKey(Json.parseObject("""{"b": "x", "a": "y"}"""))
    val json = """{"a":"y","b":"x"}"""
    assert(key.length == 4 + json.getBytes("UTF-8").length)
    assert(new String(key.drop(4), "UTF-8") == json)
    assert(key.take(4).sameElements(Rowkey.fourByteChecksum(json)))
  }

  test("checksum is big-endian CRC32 low word") {
    val crc = new java.util.zip.CRC32()
    val bytes = "abc".getBytes("UTF-8")
    crc.update(bytes, 0, bytes.length)
    val expected = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    assert(Rowkey.fourByteChecksum("abc").sameElements(expected))
  }

  test("type-sensitive: string vs number vs bool vs null ids differ") {
    val variants = Seq("""{"a": "1"}""", """{"a": 1}""", """{"a": true}""", """{"a": null}""")
    val keys = variants.map(v => Rowkey.generateKeyFromEnvelope(envelopeWith(v)).toSeq)
    assert(keys.distinct.size == variants.size)
  }

  test("string id wraps as {\"id\": s}") {
    val k1 = Rowkey.generateKeyFromEnvelope(envelopeWith(""""abc""""))
    val k2 = Rowkey.generateKey(JObj("id" -> JStr("abc")))
    assert(k1.sameElements(k2))
  }

  test("int id wraps as {\"id\": \"n\"}; long/float ids give empty key (klaxon quirk)") {
    val kInt = Rowkey.generateKeyFromEnvelope(envelopeWith("123"))
    assert(kInt.sameElements(Rowkey.generateKey(JObj("id" -> JStr("123")))))
    assert(Rowkey.generateKeyFromEnvelope(envelopeWith("3000000000")).isEmpty)
    assert(Rowkey.generateKeyFromEnvelope(envelopeWith("1.5")).isEmpty)
  }

  test("missing message/_id gives empty key") {
    assert(Rowkey.generateKeyFromEnvelope(Json.parse("""{"message": {}}""")).isEmpty)
    assert(Rowkey.generateKeyFromEnvelope(Json.parse("""{}""")).isEmpty)
    assert(Rowkey.generateKeyFromEnvelope(Json.parse("""{"message": {"_id": [1]}}""")).isEmpty)
  }

  test("case-sensitive sort: uppercase keys before lowercase") {
    val key = Rowkey.generateKey(Json.parseObject("""{"b": 1, "A": 2}"""))
    assert(new String(key.drop(4), "UTF-8") == """{"A":2,"b":1}""")
  }

  test("property: key is invariant under random key permutation (seeded)") {
    val rnd = new Random(7)
    (1 to 100).foreach { _ =>
      val n = rnd.between(1, 8)
      val kvs = (0 until n).map(i => s"k${rnd.alphanumeric.take(4).mkString}$i" -> JStr(rnd.alphanumeric.take(6).mkString))
      val o1 = JObj(kvs: _*)
      val o2 = JObj(rnd.shuffle(kvs): _*)
      assert(Rowkey.generateKey(o1).toSeq == Rowkey.generateKey(o2).toSeq)
    }
  }
}
