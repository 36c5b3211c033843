package graft.core

import java.text.{ParseException, SimpleDateFormat}
import java.util.{Date, TimeZone}

/** Lenient two-format date parse + Kafka-format output.
  *
  * Reference semantics: HBaseWriter.kt:523-541 (`kafkaDateFormat`,
  * `getValidParsedDateTime`) and MessageUtils.kt:24-41
  * (`getTimestampAsLong`). Both try `yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`
  * first, then `yyyy-MM-dd'T'HH:mm:ss.SSSZZZZ`; output format is
  * always `yyyy-MM-dd'T'HH:mm:ss.SSSZZZZ` in UTC (renders `+0000`).
  *
  * We deliberately use SimpleDateFormat (default-lenient) to keep the
  * reference's tolerant parse behavior, but pin the zone to UTC in
  * BOTH directions — the reference leaves `getTimestampAsLong` on the
  * JVM default zone, which is UTC in its deployment; pinning makes the
  * engine deterministic regardless of cluster TZ.
  */
object DateFmt {
  val IncomingFormat = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
  val OutgoingFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSZZZZ"
  val Epoch = "1980-01-01T00:00:00.000+0000"
  /** 1980-01-01T00:00:00Z in millis; records carrying this version
    * bypass the lower time filter (FilterServiceImpl.kt:26-30). */
  val EpochMillis: Long = 315532800000L

  private val utc = TimeZone.getTimeZone("UTC")

  // SimpleDateFormat is mutable (shared Calendar) so a single instance
  // cannot be called concurrently — but it IS reusable within a thread.
  // This sits on the hottest paths in the engine (q26's codegen loop and
  // the per-record ingest chain: up to 4 date fields + version parse per
  // record), where a per-call `new SimpleDateFormat` costs pattern
  // compilation + Calendar construction ~10×/record at scale. Cache one
  // formatter pair per executor thread instead.
  private def threadLocalFmt(pattern: String): ThreadLocal[SimpleDateFormat] =
    ThreadLocal.withInitial { () =>
      val df = new SimpleDateFormat(pattern)
      df.setTimeZone(utc)
      df
    }
  private val incomingFmt = threadLocalFmt(IncomingFormat)
  private val outgoingFmt = threadLocalFmt(OutgoingFormat)

  /** Parse with the two accepted formats; throws on no match. */
  def parseValid(s: String): Date = {
    try return incomingFmt.get().parse(s)
    catch { case _: Exception => () }
    try return outgoingFmt.get().parse(s)
    catch { case _: Exception => () }
    throw new ParseException(s"Unparseable date: '$s'", 0)
  }

  /** Normalize any accepted input to `...SSS+0000` UTC. */
  def kafkaFormat(input: String): String = {
    // Fast path: a STRICTLY canonical input (in-range fields, exact
    // layout, UTC zone) round-trips through parse+format to its own
    // first 23 chars + "+0000" — a pure splice, no Calendar. Anything
    // non-canonical (out-of-range fields the lenient parser would roll
    // over, other offsets, other layouts) falls back to the
    // SimpleDateFormat chain, so observable semantics are unchanged.
    // This is the hottest call in the engine (q26's codegen loop + up
    // to ~5 date fields per ingest record); the splice is ~20× the
    // formatter (measured).
    if (isCanonicalUtc(input)) input.substring(0, 23) + "+0000"
    else outgoingFmt.get().format(parseValid(input))
  }

  /** Epoch millis of an accepted timestamp string. */
  def timestampAsLong(s: String): Long =
    if (isCanonicalUtc(s)) {
      val days = epochDays(digits(s, 0, 4), digits(s, 5, 2), digits(s, 8, 2))
      days * 86400000L + digits(s, 11, 2) * 3600000L + digits(s, 14, 2) * 60000L +
        digits(s, 17, 2) * 1000L + digits(s, 20, 3)
    } else parseValid(s).getTime

  // ---------------------------------------------------------- fast path

  private def digits(s: String, from: Int, n: Int): Int = {
    var v = 0; var i = from
    while (i < from + n) { v = v * 10 + (s.charAt(i) - '0'); i += 1 }
    v
  }

  private def daysInMonth(y: Int, m: Int): Int = m match {
    case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
    case 4 | 6 | 9 | 11 => 30
    case _ => if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 29 else 28
  }

  /** Days from 1970-01-01 for a civil date (Hinnant's days_from_civil —
    * public-domain calendrical algorithm). */
  private def epochDays(y0: Int, m: Int, d: Int): Long = {
    val y = if (m <= 2) y0 - 1 else y0
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  /** True iff `s` is `yyyy-MM-ddTHH:mm:ss.SSS` followed by `Z` or
    * `+0000`, with every field strictly in range — exactly the inputs
    * whose lenient parse+format equals the splice. */
  private def isCanonicalUtc(s: String): Boolean = {
    val n = s.length
    if (n != 24 && n != 28) return false
    if (n == 24) { if (s.charAt(23) != 'Z') return false }
    else if (!(s.charAt(23) == '+' && s.charAt(24) == '0' && s.charAt(25) == '0' &&
               s.charAt(26) == '0' && s.charAt(27) == '0')) return false
    if (s.charAt(4) != '-' || s.charAt(7) != '-' || s.charAt(10) != 'T' ||
        s.charAt(13) != ':' || s.charAt(16) != ':' || s.charAt(19) != '.') return false
    var i = 0
    while (i < 23) {
      if (i != 4 && i != 7 && i != 10 && i != 13 && i != 16 && i != 19) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') return false
      }
      i += 1
    }
    val y = digits(s, 0, 4); val mo = digits(s, 5, 2); val d = digits(s, 8, 2)
    // y >= 1600: the slow path's GregorianCalendar applies the Julian
    // cutover (Oct 1582) — proleptic arithmetic diverges from it before
    // ~1583, so antique dates stay on the formatter path byte-for-byte
    y >= 1600 && mo >= 1 && mo <= 12 && d >= 1 && d <= daysInMonth(y, mo) &&
      digits(s, 11, 2) <= 23 && digits(s, 14, 2) <= 59 && digits(s, 17, 2) <= 59
  }
}
