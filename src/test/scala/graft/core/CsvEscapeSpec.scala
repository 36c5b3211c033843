package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CsvEscapeSpec extends AnyFunSuite {

  test("plain values pass through unquoted") {
    assert(CsvEscape.escapeCsv("abc|def") == "abc|def")
    assert(CsvEscape.escapeCsv("1543676462000") == "1543676462000")
  }

  test("values containing quotes are wrapped and quotes doubled") {
    assert(CsvEscape.escapeCsv("""{"a":"b"}""") == "\"{\"\"a\"\":\"\"b\"\"}\"")
  }

  test("values containing commas / CR / LF are wrapped") {
    assert(CsvEscape.escapeCsv("a,b") == "\"a,b\"")
    assert(CsvEscape.escapeCsv("a\nb") == "\"a\nb\"")
    assert(CsvEscape.escapeCsv("a\rb") == "\"a\rb\"")
  }

  test("manifest line field order and golden rendering") {
    val line = CsvEscape.csv(CsvEscape.ManifestRecord(
      id = """{"declarationId":"d1","someId":"G"}""",
      timestamp = 1543676462000L,
      db = "database-1", collection = "collection-1",
      source = "IMPORT", outerType = "HDI", innerType = "MONGO_IMPORT",
      originalId = """{"declarationId":"d1","someId":"G"}"""))
    assert(line ==
      "\"{\"\"declarationId\"\":\"\"d1\"\",\"\"someId\"\":\"\"G\"\"}\"|1543676462000|database-1|collection-1|IMPORT|HDI|" +
      "\"{\"\"declarationId\"\":\"\"d1\"\",\"\"someId\"\":\"\"G\"\"}\"|MONGO_IMPORT\n")
  }

  test("manifest file naming matches the reference layout") {
    assert(CsvEscape.manifestFileName("database-1", "collection-1", 1) == "db.database-1.collection-1-000001.csv")
    assert(CsvEscape.manifestFileName("agent_core", "agentToDoArchive", 1) == "db.agent_core.agentToDoArchive-000001.csv")
  }
}
