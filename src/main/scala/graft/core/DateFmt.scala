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
  def kafkaFormat(input: String): String = outgoingFmt.get().format(parseValid(input))

  /** Epoch millis of an accepted timestamp string. */
  def timestampAsLong(s: String): Long = parseValid(s).getTime
}
