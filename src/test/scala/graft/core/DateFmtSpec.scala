package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors HbaseWriterTest.kt:460-519 (date parsing / UTC offsets) and
  * MessageUtilsTest.kt:101-135 (timestamp parsing both formats). */
class DateFmtSpec extends AnyFunSuite {

  test("Z-suffix input is treated as UTC and reformatted to +0000") {
    assert(DateFmt.kafkaFormat("2018-12-01T15:01:02.000Z") == "2018-12-01T15:01:02.000+0000")
  }

  test("explicit offsets are normalized to UTC") {
    assert(DateFmt.kafkaFormat("2018-12-01T15:01:02.000+0100") == "2018-12-01T14:01:02.000+0000")
    assert(DateFmt.kafkaFormat("2018-12-01T15:01:02.000-0100") == "2018-12-01T16:01:02.000+0000")
  }

  test("output format is idempotent") {
    assert(DateFmt.kafkaFormat("2018-12-01T15:01:02.000+0000") == "2018-12-01T15:01:02.000+0000")
  }

  test("timestampAsLong parses both accepted formats to the same epoch") {
    assert(DateFmt.timestampAsLong("2018-12-01T15:01:02.000Z") == 1543676462000L)
    assert(DateFmt.timestampAsLong("2018-12-01T15:01:02.000+0000") == 1543676462000L)
    assert(DateFmt.timestampAsLong("2018-12-01T15:01:02.183Z") == 1543676462183L)
  }

  test("epoch constant matches 1980-01-01T00:00:00.000+0000") {
    assert(DateFmt.timestampAsLong(DateFmt.Epoch) == DateFmt.EpochMillis)
  }

  test("unparseable date throws") {
    assertThrows[java.text.ParseException](DateFmt.parseValid("2018-12-01"))
    assertThrows[java.text.ParseException](DateFmt.parseValid("not a date"))
    assertThrows[java.text.ParseException](DateFmt.parseValid(""))
  }

  test("fast path ≡ SimpleDateFormat on random canonical inputs, both suffixes (seeded)") {
    // independent slow-path reference, built fresh (not DateFmt's own)
    def slow(s: String): (String, Long) = {
      val in = new java.text.SimpleDateFormat(DateFmt.IncomingFormat)
      val out = new java.text.SimpleDateFormat(DateFmt.OutgoingFormat)
      in.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      out.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val d = try in.parse(s) catch { case _: Exception => out.parse(s) }
      (out.format(d), d.getTime)
    }
    val rnd = new scala.util.Random(7)
    (1 to 1000).foreach { _ =>
      val epoch = math.abs(rnd.nextLong()) % 4102444800000L
      val z = {
        val df = new java.text.SimpleDateFormat(DateFmt.IncomingFormat)
        df.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
        df.format(new java.util.Date(epoch))
      }
      val plus = z.dropRight(1) + "+0000"
      Seq(z, plus).foreach { s =>
        val (wantFmt, wantMs) = slow(s)
        assert(DateFmt.kafkaFormat(s) == wantFmt, s)
        assert(DateFmt.timestampAsLong(s) == wantMs, s)
      }
    }
  }

  test("pre-1600 dates stay on the Julian-cutover formatter path (no proleptic drift)") {
    // GregorianCalendar applies the Oct-1582 cutover; proleptic
    // arithmetic differs by ~10 days there. Both calls must agree with
    // a freshly-built SimpleDateFormat on these.
    Seq("1500-01-01T00:00:00.000Z", "1582-10-10T00:00:00.000Z", "1599-12-31T23:59:59.999Z")
      .foreach { s =>
        val df = new java.text.SimpleDateFormat(DateFmt.IncomingFormat)
        df.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
        val out = new java.text.SimpleDateFormat(DateFmt.OutgoingFormat)
        out.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
        val d = df.parse(s)
        assert(DateFmt.timestampAsLong(s) == d.getTime, s)
        assert(DateFmt.kafkaFormat(s) == out.format(d), s)
      }
  }

  test("non-canonical inputs fall back to the lenient parser (rollover preserved)") {
    // lenient SimpleDateFormat rolls month 13 into the next year — the
    // fast path must NOT intercept these
    assert(DateFmt.kafkaFormat("2018-13-01T00:00:00.000Z") == "2019-01-01T00:00:00.000+0000")
    assert(DateFmt.kafkaFormat("2018-02-30T00:00:00.000Z") == "2018-03-02T00:00:00.000+0000")
    assert(DateFmt.kafkaFormat("2018-12-01T24:00:00.000Z") == "2018-12-02T00:00:00.000+0000")
    // non-UTC offsets go through real date math
    assert(DateFmt.timestampAsLong("2018-12-01T15:01:02.000+0100") ==
      DateFmt.timestampAsLong("2018-12-01T14:01:02.000Z"))
  }

  test("property: format∘parse round-trips over random epochs (seeded)") {
    val rnd = new scala.util.Random(99)
    (1 to 500).foreach { _ =>
      val epoch = math.abs(rnd.nextLong()) % 4102444800000L // within year 2100
      val formatted = {
        val df = new java.text.SimpleDateFormat(DateFmt.OutgoingFormat)
        df.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
        df.format(new java.util.Date(epoch))
      }
      assert(DateFmt.timestampAsLong(formatted) == epoch, formatted)
      assert(DateFmt.kafkaFormat(formatted) == formatted) // idempotent on canonical form
    }
  }
}
