package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Not a correctness spec — a single-threaded component profile of the
  * per-record ingest chain, printed so a regression (or a claimed
  * optimization) has a measured baseline. Tagged as a plain test so it
  * runs with the suite; asserts only sanity bounds. */
class RecordChainProfile extends AnyFunSuite {

  private val sample =
    """{"_id":{"declarationId":"d-123456","someId":"RANDOM_GUID"},""" +
      """"_lastModifiedDateTime":{"$date":"2018-12-01T15:01:02.000Z"},""" +
      """"createdDateTime":{"$date":"2017-10-10T10:10:10.100Z"},""" +
      """"someField":"value-one","nested":{"a":1,"b":[1,2,3],"c":"x"},""" +
      """"longerText":"Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do eiusmod tempor."}"""

  test("per-record chain component timings (single thread, 20k records)") {
    val n = 20000
    val key = java.util.Base64.getEncoder.encodeToString(new Array[Byte](16))
    val dk = Envelope.DataKeyResult("kek", key, "ciph")
    val ctx = RecordProcessor.FileContext("db", "coll", 1, dk)
    val identity = Envelope.RunIdentity("uow", "trace", "test", () => new java.util.Date(0L))
    val iv: () => Array[Byte] = () => new Array[Byte](16)

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"$label%-22s ${n / sec}%,.0f rec/s  (${sec * 1e6 / n}%.1f us/rec)")
      sec
    }

    // warmup
    (1 to 3000).foreach(_ => RecordProcessor.processLine(sample, ctx, identity, iv))

    time("json parse") { (1 to n).foreach(_ => Json.parseObject(sample)) }
    val rec = Json.parseObject(sample)
    time("json render") { (1 to n).foreach(_ => Json.renderRecord(rec)) }
    time("rowkey") { (1 to n).foreach(_ => Rowkey.generateKey(Json.parseObject("""{"declarationId":"d-123456","someId":"RANDOM_GUID"}"""))) }
    val bytes = sample.getBytes("UTF-8")
    time("aes encrypt") { (1 to n).foreach(_ => Crypto.encrypt(key, bytes, iv)) }
    time("date kafkaFormat") { (1 to n).foreach(_ => DateFmt.kafkaFormat("2018-12-01T15:01:02.000Z")) }
    time("reformat rm+arch") { (1 to n).foreach { _ =>
      val (a, _) = Transforms.reformatRemoved(sample); Transforms.reformatArchived(a)
    } }
    time("3x optionalDateTime") { (1 to n).foreach { _ =>
      Transforms.optionalDateTime(Transforms.CreatedField, rec)
      Transforms.optionalDateTime(Transforms.RemovedField, rec)
      Transforms.optionalDateTime(Transforms.ArchivedField, rec)
    } }
    time("normalisedId") { (1 to n).foreach(_ => Transforms.normalisedId(rec.get("_id"))) }
    locally {
      val enc = Crypto.encrypt(key, bytes, iv)
      val dkr = dk
      time("envelope render") { (1 to n).foreach(_ =>
        Envelope.produceMessage(rec, "id", true, false, "2018-12-01T15:01:02.000+0000",
          Transforms.LastModifiedField, false, false, false, false, false,
          enc, dkr, "db", "coll", identity)) }
    }
    val total = time("processLine (full)") {
      (1 to n).foreach(_ => RecordProcessor.processLine(sample, ctx, identity, iv))
    }
    // sanity: the full chain should stay comfortably above 5k rec/s/thread
    assert(n / total > 5000, f"full chain too slow: ${n / total}%.0f rec/s")
  }
}
