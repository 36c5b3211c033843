package graft.core

import java.nio.ByteBuffer
import java.util.zip.CRC32

/** Rowkey derivation (reference operators K2, K3 —
  * MessageUtils.kt:74-149). The rowkey is:
  *
  *   4-byte big-endian CRC32(sortedIdJson) ++ UTF-8 bytes of sortedIdJson
  *
  * where sortedIdJson is the compact, top-level-key-sorted rendering of
  * the id object extracted from the envelope's `message._id`. The CRC
  * prefix spreads keys uniformly across the sink's key space (the
  * reference's HBase region anti-hotspotting; equivalently a built-in
  * key salt for any range-partitioned sink).
  */
object Rowkey {

  /** K2 — extract the id object from a parsed envelope
    * (MessageUtils.kt:79-112):
    * string → {"id": s}; Int-range integer → {"id": "n"}; object → as
    * is; anything else (incl. Long/Double ids, klaxon quirk) → None. */
  def getId(envelope: JValue): Option[JObj] = {
    val message = envelope match {
      case o: JObj => o.get("message")
      case _ => None
    }
    message match {
      case Some(m: JObj) => m.get("_id").flatMap(idToKeyObject)
      case _ => None
    }
  }

  /** The `message._id` → key-object rule, factored so callers holding
    * the id VALUE (e.g. the envelope producer, which rendered it) need
    * not re-parse the whole envelope to apply it. */
  def idToKeyObject(idValue: JValue): Option[JObj] = idValue match {
    case o: JObj => Some(o)
    case JStr(s) => Some(JObj("id" -> JStr(s)))
    case n: JNum =>
      // klaxon `is Int` branch: only Int-ranged integers qualify
      n.toLongExact.filter(l => l >= Int.MinValue && l <= Int.MaxValue)
        .map(l => JObj("id" -> JStr(l.toString)))
    case _ => None
  }

  /** K3 — 4-byte big-endian CRC32 (MessageUtils.kt:142-149). */
  def fourByteChecksum(input: String): Array[Byte] = {
    val bytes = input.getBytes("UTF-8")
    val crc = new CRC32()
    crc.update(bytes, 0, bytes.length)
    ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
  }

  /** K3 — checksum-prefixed key bytes for an id object. */
  def generateKey(id: JObj): Array[Byte] = {
    val sorted = Json.sortByKeyCompact(id)
    fourByteChecksum(sorted) ++ sorted.getBytes("UTF-8")
  }

  /** Key for a whole envelope; empty array when no usable id
    * (MessageUtils.kt:74-77). */
  def generateKeyFromEnvelope(envelope: JValue): Array[Byte] =
    getId(envelope).map(generateKey).getOrElse(Array.emptyByteArray)
}
