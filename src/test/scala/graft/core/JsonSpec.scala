package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class JsonSpec extends AnyFunSuite {

  test("parses and renders compact object preserving insertion order") {
    val o = Json.parseObject("""{"b": 1, "a": "x", "c": [1, 2.5, true, null]}""")
    assert(Json.renderCompact(o) == """{"b":1,"a":"x","c":[1,2.5,true,null]}""")
  }

  test("duplicate keys: last value wins, first position kept") {
    val o = Json.parseObject("""{"a": 1, "b": 2, "a": 3}""")
    assert(Json.renderCompact(o) == """{"a":3,"b":2}""")
  }

  test("string escapes round-trip") {
    val o = Json.parseObject("""{"s": "a\"b\\c\nd\tef"}""")
    assert(o.get("s").contains(JStr("a\"b\\c\nd\tef")))
    assert(Json.renderCompact(o) == "{\"s\":\"a\\\"b\\\\c\\nd\\te\\u0001f\"}")
  }

  test("control characters render as lowercase \\uXXXX") {
    val o = JObj("s" -> JStr("x\u0001y\u009fz"))
    assert(Json.renderCompact(o) == "{\"s\":\"x\\u0001y\\u009fz\"}")
  }

  test("klaxon-style numbers: integers normalized, floats via Double.toString") {
    assert(Json.renderCompact(Json.parse("""[1, -2, 1.50, 1e3, 20150320]""")) ==
      "[1,-2,1.5,1000.0,20150320]")
  }

  test("gson-style record rendering preserves number literals and html-escapes") {
    val o = Json.parseObject("""{"n": 1.50, "s": "a<b>"}""")
    assert(Json.renderRecord(o) == "{\"n\":1.50,\"s\":\"a\\u003cb\\u003e\"}")
  }

  test("nulls are serialized (Gson serializeNulls)") {
    assert(Json.renderRecord(Json.parseObject("""{"a": null}""")) == """{"a":null}""")
  }

  test("sortByKeyCompact sorts top-level keys case-sensitively, not nested") {
    val o = Json.parseObject("""{"b": {"z": 1, "a": 2}, "B": 3, "a": 4}""")
    // case-sensitive: uppercase before lowercase
    assert(Json.sortByKeyCompact(o) == """{"B":3,"a":4,"b":{"z":1,"a":2}}""")
  }

  test("malformed input throws") {
    assertThrows[JsonParseException](Json.parse("""{"a": """))
    assertThrows[JsonParseException](Json.parse("""{"a": 1} trailing"""))
    assertThrows[JsonParseException](Json.parseObject("""[1,2]"""))
  }

  test("deepCopy isolates mutation") {
    val o = Json.parseObject("""{"a": {"b": 1}}""")
    val c = o.deepCopy
    c.get("a").get.asInstanceOf[JObj].overwrite("b", JNum("2"))
    assert(Json.renderCompact(o) == """{"a":{"b":1}}""")
  }

  test("property: render∘parse is stable over random trees (seeded)") {
    val rnd = new Random(42)
    def randomValue(depth: Int): JValue = rnd.nextInt(if (depth <= 0) 4 else 6) match {
      case 0 => JNull
      case 1 => JBool(rnd.nextBoolean())
      case 2 => JNum(rnd.between(-1000000L, 1000000L).toString)
      case 3 => JStr(rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
      case 4 => JArr(Vector.fill(rnd.nextInt(4))(randomValue(depth - 1)))
      case _ => randomObj(depth - 1)
    }
    def randomObj(depth: Int): JObj = {
      val o = JObj.empty
      (0 until rnd.nextInt(6)).foreach { i =>
        o.put(s"k${i}_" + rnd.alphanumeric.take(3).mkString, randomValue(depth))
      }
      o
    }
    (1 to 200).foreach { _ =>
      val o = randomObj(3)
      val once = Json.renderCompact(o)
      val twice = Json.renderCompact(Json.parseObject(once))
      assert(once == twice)
    }
  }
}
