package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Transforms._
import graft.core.Transforms.IdModification._

/** Mirrors the reference transform corpus: HbaseWriterTest.kt:266-444,
  * 570-610 (id shapes), :612-674 (lastModified fallback), :770-1022
  * (removed/archived restructure), :1061-2099 (coalescing). */
class TransformsSpec extends AnyFunSuite {

  // ------------------------------------------------------ normalisedId (T4)

  test("oid-only object id flattens to its string (FlattenedMongoId)") {
    val (id, mod) = normalisedId(Json.parseObject("""{"_id": {"$oid": "abc-123"}}""").get("_id"))
    assert(id == "abc-123" && mod == FlattenedMongoId)
  }

  test("oid plus other keys is NOT flattened (UnmodifiedObjectId)") {
    val (id, mod) = normalisedId(Json.parseObject("""{"_id": {"$oid": "abc", "x": 1}}""").get("_id"))
    assert(id == """{"$oid":"abc","x":1}""" && mod == UnmodifiedObjectId)
  }

  test("object id with $date-wrapped createdDateTime flattens the inner date (FlattenedInnerDate)") {
    val in = Json.parseObject(
      """{"_id": {"someId": "G", "createdDateTime": {"$date": "2010-01-01T00:00:00.000Z"}}}""")
    val (id, mod) = normalisedId(in.get("_id"))
    assert(mod == FlattenedInnerDate)
    assert(id == """{"someId":"G","createdDateTime":"2010-01-01T00:00:00.000+0000"}""")
  }

  test("all four date fields flatten inside the id") {
    val in = Json.parseObject(
      """{"_id": {"createdDateTime": {"$date": "2010-01-01T00:00:00.000Z"},
                  "_lastModifiedDateTime": {"$date": "2011-01-01T00:00:00.000Z"},
                  "_removedDateTime": {"$date": "2012-01-01T00:00:00.000Z"},
                  "_archivedDateTime": {"$date": "2013-01-01T00:00:00.000Z"}}}""")
    val (id, mod) = normalisedId(in.get("_id"))
    assert(mod == FlattenedInnerDate)
    assert(id.contains(""""createdDateTime":"2010-01-01T00:00:00.000+0000""""))
    assert(id.contains(""""_lastModifiedDateTime":"2011-01-01T00:00:00.000+0000""""))
    assert(id.contains(""""_removedDateTime":"2012-01-01T00:00:00.000+0000""""))
    assert(id.contains(""""_archivedDateTime":"2013-01-01T00:00:00.000+0000""""))
  }

  test("plain object id is serialized as-is (UnmodifiedObjectId)") {
    val (id, mod) = normalisedId(Json.parseObject("""{"_id": {"b": 1, "a": 2}}""").get("_id"))
    assert(id == """{"b":1,"a":2}""" && mod == UnmodifiedObjectId)
  }

  test("string id passes through (UnmodifiedStringId)") {
    val (id, mod) = normalisedId(Some(JStr("id-1")))
    assert(id == "id-1" && mod == UnmodifiedStringId)
  }

  test("numeric id becomes its literal string (UnmodifiedStringId)") {
    val (id, mod) = normalisedId(Some(JNum("12345")))
    assert(id == "12345" && mod == UnmodifiedStringId)
  }

  test("null / array / absent ids are invalid") {
    assert(normalisedId(Some(JNull)) == ("", InvalidId))
    assert(normalisedId(Some(JArr(Vector(JNum("1"))))) == ("", InvalidId))
    assert(normalisedId(None) == ("", InvalidId))
  }

  // --------------------------------------------- removed / archived (T1/T2)

  test("_removed unwraps, transplants dates + timestamp, forces MONGO_DELETE") {
    val line =
      """{"_removed": {"_id": {"id": "1"}, "a": 1, "_lastModifiedDateTime": "inner-lmd"},
         "_lastModifiedDateTime": "outer-lmd",
         "_removedDateTime": {"$date": "2012-03-04T21:43:56.000Z"},
         "timestamp": 123456}"""
    val (rec, isRemoved) = reformatRemoved(line)
    assert(isRemoved)
    assert(rec.get("_lastModifiedDateTime").contains(JStr("outer-lmd")))
    assert(rec.get("timestamp").contains(JNum("123456")))
    assert(rec.get("@type").contains(JStr("MONGO_DELETE")))
    assert(rec.get("a").contains(JNum("1")))
    assert(rec.get("_removedDateTime").exists(_.isObj))
  }

  test("_archived unwraps the same way with _archivedDateTime") {
    val (afterRemoved, r) = reformatRemoved(
      """{"_archived": {"_id": "x", "b": 2}, "_archivedDateTime": {"$date": "2014-03-02T12:34:56.000Z"}}""")
    assert(!r)
    val (rec, isArchived) = reformatArchived(afterRemoved)
    assert(isArchived)
    assert(rec.get("@type").contains(JStr("MONGO_DELETE")))
    assert(rec.get("b").contains(JNum("2")))
  }

  test("_removed wins over _archived when both present (T1 before T2)") {
    val line = """{"_removed": {"_id": "r"}, "_archived": {"_id": "a"}}"""
    val (rec, isRemoved) = reformatRemoved(line)
    assert(isRemoved && rec.get("_id").contains(JStr("r")))
    // inner record has no _archived, so reformatArchived is a no-op
    val (rec2, isArchived) = reformatArchived(rec)
    assert(!isArchived && rec2.get("_id").contains(JStr("r")))
  }

  test("record without wrappers passes through unchanged") {
    val (rec, isRemoved) = reformatRemoved("""{"_id": "x", "v": 1}""")
    assert(!isRemoved && rec.get("v").contains(JNum("1")))
    val (rec2, isArchived) = reformatArchived(rec)
    assert(!isArchived)
  }

  // ---------------------------------------------- lastModified fallback (T6)

  test("$date-wrapped lastModified wins, provenance Stripped") {
    val lmd = Json.parseObject("""{"f": {"$date": "2018-12-01T15:01:02.000Z"}}""").get("f")
    assert(lastModifiedDateTime(lmd, "created") ==
      ("2018-12-01T15:01:02.000+0000", "_lastModifiedDateTimeStripped"))
  }

  test("plain-string lastModified is kept verbatim, provenance _lastModifiedDateTime") {
    assert(lastModifiedDateTime(Some(JStr("2001-01-01T00:00:00.000Z")), "created") ==
      ("2001-01-01T00:00:00.000Z", "_lastModifiedDateTime"))
  }

  test("absent lastModified falls back to createdDateTime") {
    assert(lastModifiedDateTime(None, "2015-03-20T12:23:25.183+0000") ==
      ("2015-03-20T12:23:25.183+0000", "createdDateTime"))
  }

  test("absent lastModified and blank created falls back to epoch") {
    assert(lastModifiedDateTime(None, "") == (DateFmt.Epoch, "epoch"))
    assert(lastModifiedDateTime(None, "  ") == (DateFmt.Epoch, "epoch"))
  }

  test("object without $date falls back (created, then epoch)") {
    val bad = Json.parseObject("""{"f": {"nope": 1}}""").get("f")
    assert(lastModifiedDateTime(bad, "c") == ("c", "createdDateTime"))
    assert(lastModifiedDateTime(bad, "") == (DateFmt.Epoch, "epoch"))
  }

  // ------------------------------------------------- optionalDateTime (T7)

  test("optional date: $date object is reformatted, modified=true") {
    val p = Json.parseObject("""{"createdDateTime": {"$date": "2015-03-20T12:23:25.183Z"}}""")
    assert(optionalDateTime("createdDateTime", p) == ("2015-03-20T12:23:25.183+0000", true))
  }

  test("optional date: string passes through, modified=false") {
    val p = Json.parseObject("""{"createdDateTime": "as-is"}""")
    assert(optionalDateTime("createdDateTime", p) == ("as-is", false))
  }

  test("optional date: invalid object → empty, modified=true") {
    val p = Json.parseObject("""{"createdDateTime": {"a": 1, "b": 2}}""")
    assert(optionalDateTime("createdDateTime", p) == ("", true))
  }

  test("optional date: absent → empty, modified=false") {
    assert(optionalDateTime("createdDateTime", JObj.empty) == ("", false))
  }

  // ------------------------------------------------------- incomingId (T10)

  test("incomingId key-sorts object ids and passes strings through") {
    val o = Json.parseObject("""{"_id": {"someId": "G", "declarationId": "d1"}}""")
    assert(incomingId(o.get("_id")) == """{"declarationId":"d1","someId":"G"}""")
    assert(incomingId(Some(JStr("s"))) == "s")
    assert(incomingId(Some(JNull)) == "")
    assert(incomingId(None) == "")
  }

  // ------------------------------------------------------- coalescing (T11)

  test("all 33 split-collection suffixes strip at end-of-name") {
    val suffixes = Seq("one", "two", "three", "four", "five", "six", "seven", "eight", "nine", "ten",
      "eleven", "twelve", "thirteen", "fourteen", "fifteen", "sixteen", "seventeen", "eighteen",
      "nineteen", "twenty", "twentyone", "twentytwo", "twentythree", "twentyfour", "twentyfive",
      "twentysix", "twentyseven", "twentyeight", "twentynine", "thirty", "thirtyone", "thirtytwo",
      "archived")
    suffixes.foreach { s => assert(coalesced(s"collection-$s") == "collection", s"suffix $s") }
  }

  test("suffix only strips at the very end, and unknown suffixes survive") {
    assert(coalesced("collection-one-extra") == "collection-one-extra")
    assert(coalesced("collection-fortytwo") == "collection-fortytwo")
    assert(coalesced("collection") == "collection")
  }

  test("agentToDoArchive table merge applies only to agent_core") {
    assert(coalescedArchive("agent_core:agentToDoArchive") == "agent_core:agentToDo")
    assert(coalescedArchive("other_db:agentToDoArchive") == "other_db:agentToDoArchive")
    assert(coalescedArchive("agent_core:other") == "agent_core:other")
  }
}
