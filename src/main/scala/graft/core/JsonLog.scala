package graft.core

import java.net.InetAddress
import java.text.SimpleDateFormat
import java.util.{Date, TimeZone}

/** X3 — structured JSON logging with a correlation id (reference
  * LoggerUtils.kt:1-228 + JsonLoggerWrapper/LoggerLayoutAppender).
  * Every emitted line is one JSON object:
  *
  * {{{
  * { "timestamp":"2001-07-04T12:08:56.235", "log_level":"INFO",
  *   "message":"msg", "key":"value", ..., ["exception":"...",]
  *   "thread":"...", "logger":"...", "duration_in_milliseconds":"...",
  *   "hostname":"...", "environment":"...", "application":"...",
  *   "app_version":"...", "component":"...", "correlation_id":"...",
  *   "data_family":"cf" }
  * }}}
  *
  * Reference semantics kept exactly: message/values JSON-escaped,
  * multi-line text flattened with " | " and tabs to spaces, kv pairs
  * must come in matched key/value tuples, static fields seeded from
  * system properties with NOT_SET defaults, duration measured from
  * process-start. The sink is injectable so specs capture lines;
  * default is stderr (one line per event, Spark-log friendly).
  */
object JsonLog {

  val UnsetText = "NOT_SET"

  @volatile var correlationId: String = System.getProperty("correlation_id", UnsetText)
  @volatile var sink: String => Unit = System.err.println
  @volatile private var startTimeMs: Long = System.currentTimeMillis()

  private val hostname =
    try InetAddress.getLocalHost.getHostName catch { case _: Exception => UnsetText }
  private def prop(k: String) = System.getProperty(k, UnsetText)

  /** 2001-07-04T12:08:56.235 in UTC (makeUtcDateFormat) */
  private val tsFormat = {
    val df = new SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss.SSS")
    df.setTimeZone(TimeZone.getTimeZone("UTC"))
    df
  }

  def resetStartTimeForTests(ms: Long): Unit = startTimeMs = ms

  /** escapeJson-alike: quotes, backslash, control chars. */
  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** flattenMultipleLines: newlines → " | ", tabs → spaces. */
  def flatten(text: String): String =
    if (text == null) "null" else text.replace("\n", " | ").replace("\t", " ")

  /** semiFormattedTuples: message then matched kv pairs — every
    * component flattened to one line FIRST, then json-escaped. */
  def semiFormatted(message: String, tuples: Seq[(String, String)]): String = {
    val b = new StringBuilder(esc(flatten(message)))
    tuples.foreach { case (k, v) =>
      b.append("\", \"").append(k).append("\":\"").append(esc(flatten(v)))
    }
    b.toString
  }

  def info(logger: String, message: String, tuples: (String, String)*): Unit =
    emit("INFO", logger, message, tuples, None)
  def warn(logger: String, message: String, tuples: (String, String)*): Unit =
    emit("WARN", logger, message, tuples, None)
  def error(logger: String, message: String, tuples: (String, String)*): Unit =
    emit("ERROR", logger, message, tuples, None)
  def error(logger: String, message: String, e: Throwable, tuples: (String, String)*): Unit =
    emit("ERROR", logger, message, tuples, Some(e))

  private def emit(level: String, logger: String, message: String,
                   tuples: Seq[(String, String)], e: Option[Throwable]): Unit = {
    val now = System.currentTimeMillis()
    val ts = tsFormat.synchronized(tsFormat.format(new Date(now)))
    val exception = e.map { t =>
      val sw = new java.io.StringWriter()
      t.printStackTrace(new java.io.PrintWriter(sw))
      s""""exception":"${esc(flatten(sw.toString))}", """
    }.getOrElse("")
    val line =
      s"""{ "timestamp":"$ts", "log_level":"$level", """ +
        s""""message":"${semiFormatted(message, tuples)}", """ +
        exception +
        s""""thread":"${esc(Thread.currentThread().getName)}", "logger":"${esc(logger)}", """ +
        s""""duration_in_milliseconds":"${now - startTimeMs}", """ +
        s""""hostname":"${esc(hostname)}", "environment":"${esc(prop("environment"))}", """ +
        s""""application":"${esc(prop("application"))}", "app_version":"${esc(prop("app_version"))}", """ +
        s""""component":"${esc(prop("component_name"))}", "correlation_id":"${esc(correlationId)}", """ +
        s""""data_family":"cf" }"""
    sink(line)
  }
}
