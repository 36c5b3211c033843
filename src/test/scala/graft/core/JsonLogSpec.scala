package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** X3 — the structured log line format (reference LoggerUtils.kt:
  * LoggerLayoutAppender field order, semiFormattedTuples kv rendering,
  * flattenMultipleLines, correlation id propagation). */
class JsonLogSpec extends AnyFunSuite {

  private def capture(body: => Unit): Seq[String] = {
    val lines = Seq.newBuilder[String]
    val prev = JsonLog.sink
    JsonLog.sink = l => lines.synchronized { lines += l }
    try body finally JsonLog.sink = prev
    lines.result()
  }

  test("line is one JSON object with the reference's field order and static fields") {
    JsonLog.correlationId = "corr-123"
    val Seq(line) = capture(JsonLog.info("MyLogger", "Written manifest", "manifest_size" -> "42"))
    assert(line.startsWith("""{ "timestamp":""""))
    assert(line.contains(""""log_level":"INFO""""))
    assert(line.contains(""""message":"Written manifest", "manifest_size":"42""""))
    assert(line.contains(""""logger":"MyLogger""""))
    assert(line.contains(""""correlation_id":"corr-123""""))
    assert(line.contains(""""data_family":"cf""""))
    assert(line.contains(""""duration_in_milliseconds":""""))
    assert(line.endsWith("} ".trim))
    // parses as JSON (the whole point of structured logging)
    Json.parseObject(line)
  }

  test("values are json-escaped and multi-line text flattens with ' | '") {
    val Seq(line) = capture(JsonLog.warn("L", "bad \"thing\"\nsecond line", "k" -> "a\tb"))
    assert(line.contains("""bad \"thing\" | second line"""))
    assert(line.contains(""""k":"a b""""))
    Json.parseObject(line)
  }

  test("errors inline the stack trace on one line") {
    val boom = new RuntimeException("kapow")
    val Seq(line) = capture(JsonLog.error("L", "Failed to write manifest", boom, "attempt" -> "10"))
    assert(line.contains(""""exception":"java.lang.RuntimeException: kapow | """))
    assert(!line.contains("\n\tat")) // flattened, single line
    assert(line.contains(""""attempt":"10""""))
    Json.parseObject(line)
  }

  test("timestamp format matches the reference layout (UTC, millis)") {
    val Seq(line) = capture(JsonLog.info("L", "m"))
    val ts = """"timestamp":"([^"]+)"""".r.findFirstMatchIn(line).get.group(1)
    assert(ts.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}"""))
  }
}
