package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayInputStream
import java.io.ByteArrayOutputStream
import java.util.Base64
import java.util.zip.GZIPOutputStream

class CryptoSpec extends AnyFunSuite {

  private val keyB64 = Base64.getEncoder.encodeToString(Array.fill[Byte](16)(7))
  private def fixedIv: () => Array[Byte] = () => Array.tabulate[Byte](16)(_.toByte)

  test("encrypt then decrypt round-trips") {
    val plain = """{"_id":"x","v":1}"""
    val res = Crypto.encrypt(keyB64, plain.getBytes("UTF-8"), fixedIv)
    val back = Crypto.decrypt(keyB64, res.initialisationVector, res.encrypted)
    assert(new String(back, "UTF-8") == plain)
  }

  test("encryption is deterministic given a fixed IV (replay safety)") {
    val plain = "hello".getBytes("UTF-8")
    val a = Crypto.encrypt(keyB64, plain, fixedIv)
    val b = Crypto.encrypt(keyB64, plain, fixedIv)
    assert(a == b)
  }

  test("distinct IVs give distinct ciphertext") {
    val plain = "hello".getBytes("UTF-8")
    val ivs = Crypto.secureRandomIvSource()
    val a = Crypto.encrypt(keyB64, plain, ivs)
    val b = Crypto.encrypt(keyB64, plain, ivs)
    assert(a.encrypted != b.encrypted && a.initialisationVector != b.initialisationVector)
  }

  test("decompressingDecryptingStream reverses gzip-then-AES-CTR (the input file format)") {
    val lines = "line-one\nline-two\n"
    val gz = new ByteArrayOutputStream()
    val go = new GZIPOutputStream(gz)
    go.write(lines.getBytes("UTF-8")); go.close()
    // encrypt the compressed bytes the way sample_data.py does
    val enc = Crypto.encrypt(keyB64, gz.toByteArray, fixedIv)
    val raw = Base64.getDecoder.decode(enc.encrypted)
    val in = Crypto.decompressingDecryptingStream(new ByteArrayInputStream(raw), keyB64, enc.initialisationVector)
    val out = new String(in.readAllBytes(), "UTF-8")
    assert(out == lines)
  }
}
