package graft.core

/** Per-record JSON shape transforms (reference operators T1-T8, T10).
  * All pure functions over the [[JValue]] tree; semantics cited to
  * /root/reference/src/main/kotlin/app/batch/HBaseWriter.kt.
  */
object Transforms {

  val LastModifiedField = "_lastModifiedDateTime"
  val CreatedField = "createdDateTime"
  val RemovedField = "_removedDateTime"
  val ArchivedField = "_archivedDateTime"
  val LastModifiedStripped = "_lastModifiedDateTimeStripped"
  val EpochField = "epoch"
  val MongoDelete = "MONGO_DELETE"
  private val RemovedRecordField = "_removed"
  private val ArchivedRecordField = "_archived"
  private val TimestampField = "timestamp"

  /** Id normalization outcome ADT — HBaseWriter.kt IdModification enum. */
  sealed trait IdModification
  object IdModification {
    case object UnmodifiedObjectId extends IdModification
    case object UnmodifiedStringId extends IdModification
    case object FlattenedMongoId extends IdModification
    case object FlattenedInnerDate extends IdModification
    case object InvalidId extends IdModification
  }
  import IdModification._

  /** T1 — unwrap `_removed` soft-delete: the inner record becomes the
    * record; `_lastModifiedDateTime`, `_removedDateTime`, `timestamp`
    * are transplanted from the wrapper (overwriting), `@type` is forced
    * MONGO_DELETE. HBaseWriter.kt:338-351. */
  def reformatRemoved(line: String): (JObj, Boolean) = {
    val record = Json.parseObject(line)
    reformatWrapper(record, RemovedRecordField, RemovedField)
  }

  /** T2 — same for `_archived` + `_archivedDateTime`. HBaseWriter.kt:353-364. */
  def reformatArchived(record: JObj): (JObj, Boolean) =
    reformatWrapper(record, ArchivedRecordField, ArchivedField)

  private def reformatWrapper(record: JObj, wrapperField: String, dateField: String): (JObj, Boolean) =
    record.get(wrapperField) match {
      case Some(inner: JObj) =>
        val out = inner.deepCopy
        copyField(LastModifiedField, record, out)
        copyField(dateField, record, out)
        copyField(TimestampField, record, out)
        out.overwrite("@type", JStr(MongoDelete))
        (out, true)
      case Some(_) =>
        // reference getAsJsonObject throws on non-object wrapper → record
        // becomes a parse failure handled by the caller's F4 skip
        throw JsonParseException(s"$wrapperField is not an object", 0)
      case None => (record, false)
    }

  /** T3 — overwrite-copy a field if present on the source. HBaseWriter.kt:366-373. */
  def copyField(fieldName: String, source: JObj, target: JObj): Unit =
    source.get(fieldName).foreach { v =>
      target.overwrite(fieldName, Json.deepCopy(v))
    }

  /** T5 — field is an object with exactly one key `$date` whose value is
    * primitive. HBaseWriter.kt:432-437. */
  def hasDateField(obj: JObj, field: String): Boolean =
    obj.get(field) match {
      case Some(o: JObj) =>
        o.size == 1 && (o.get("$date") match {
          case Some(_: JStr) | Some(_: JNum) | Some(_: JBool) => true
          case _ => false
        })
      case _ => false
    }

  private def datePrimitiveAsString(v: JValue): String = v match {
    case JStr(s) => s
    case JNum(raw) => raw
    case JBool(b) => b.toString
    case _ => throw JsonParseException("$date value not primitive", 0)
  }

  private def flattenedDateField(obj: JObj, field: String): JObj = {
    if (hasDateField(obj, field)) {
      val ds = datePrimitiveAsString(obj.get(field).get.asInstanceOf[JObj].get("$date").get)
      obj.overwrite(field, JStr(DateFmt.kafkaFormat(ds)))
    }
    obj
  }

  /** T4 — id normalization. HBaseWriter.kt:387-430.
    *  - object `{"$oid": s}` (sole key, primitive) → s, FlattenedMongoId
    *  - object containing any of the 4 date fields as `$date` wrappers →
    *    each flattened to kafka format, re-serialized, FlattenedInnerDate
    *  - any other object → serialized as-is, UnmodifiedObjectId
    *  - primitive → its string value, UnmodifiedStringId
    *  - null / array / absent → ("", InvalidId)
    */
  def normalisedId(id: Option[JValue]): (String, IdModification) = id match {
    case Some(o: JObj) =>
      val obj = o.deepCopy
      val oid = obj.get("$oid")
      if (obj.size == 1 && oid.exists(v => v.isInstanceOf[JStr] || v.isInstanceOf[JNum] || v.isInstanceOf[JBool]))
        (datePrimitiveAsString(oid.get), FlattenedMongoId)
      else if (hasDateField(obj, CreatedField) || hasDateField(obj, LastModifiedField) ||
               hasDateField(obj, RemovedField) || hasDateField(obj, ArchivedField)) {
        var flat = flattenedDateField(obj, CreatedField)
        flat = flattenedDateField(flat, LastModifiedField)
        flat = flattenedDateField(flat, RemovedField)
        flat = flattenedDateField(flat, ArchivedField)
        (Json.renderRecord(flat), FlattenedInnerDate)
      }
      else (Json.renderRecord(o), UnmodifiedObjectId)
    case Some(JStr(s)) => (s, UnmodifiedStringId)
    case Some(JNum(raw)) => (raw, UnmodifiedStringId)
    case Some(JBool(b)) => (b.toString, UnmodifiedStringId)
    case _ => ("", InvalidId)
  }

  /** T6 — `_lastModifiedDateTime` fallback hierarchy, returning
    * (value, source-field provenance). HBaseWriter.kt:439-471. */
  def lastModifiedDateTime(incoming: Option[JValue], createdDateTime: String): (String, String) = {
    val fallbackDate = if (createdDateTime.trim.nonEmpty) createdDateTime else DateFmt.Epoch
    val fallbackField = if (fallbackDate == DateFmt.Epoch) EpochField else CreatedField
    incoming match {
      case Some(o: JObj) =>
        o.get("$date") match {
          case Some(d) if o.size == 1 && (d.isInstanceOf[JStr] || d.isInstanceOf[JNum] || d.isInstanceOf[JBool]) =>
            (DateFmt.kafkaFormat(datePrimitiveAsString(d)), LastModifiedStripped)
          case _ => (fallbackDate, fallbackField)
        }
      case Some(JStr(s)) => (s, LastModifiedField)
      case Some(JNum(raw)) => (raw, LastModifiedField)
      case Some(JBool(b)) => (b.toString, LastModifiedField)
      case _ => (fallbackDate, fallbackField)
    }
  }

  /** T7 — optional date field ({created,removed,archived}DateTime),
    * returning (value, wasModified). HBaseWriter.kt:473-502. */
  def optionalDateTime(name: String, parent: JObj): (String, Boolean) =
    parent.get(name) match {
      case Some(o: JObj) =>
        o.get("$date") match {
          case Some(d) if o.size == 1 && (d.isInstanceOf[JStr] || d.isInstanceOf[JNum] || d.isInstanceOf[JBool]) =>
            (DateFmt.kafkaFormat(datePrimitiveAsString(d)), true)
          case _ => ("", true)
        }
      case Some(JStr(s)) => (s, false)
      case Some(JNum(raw)) => (raw, false)
      case Some(JBool(b)) => (b.toString, false)
      case Some(_) => ("", true)
      case None => ("", false)
    }

  /** T10 — original `_id` for manifest provenance: object → key-sorted
    * compact JSON; primitive → string; else "". HBaseWriter.kt:504-521. */
  def incomingId(id: Option[JValue]): String = id match {
    case Some(o: JObj) => Json.sortByKeyCompact(o)
    case Some(JStr(s)) => s
    case Some(JNum(raw)) => raw
    case Some(JBool(b)) => b.toString
    case _ => ""
  }

  /** T11 — collection coalescing: strip the 33 split-collection
    * suffixes ($-anchored); table-level archive merge applies ONLY to
    * agent_core:agentToDoArchive. HBaseWriter.kt:324-336,601. */
  private val CoalescedCollection =
    ("-(archived|eight|eighteen|eleven|fifteen|five|four|fourteen|nine|nineteen|one|seven|seventeen|six|" +
     "sixteen|ten|thirteen|thirty|thirtyone|thirtytwo|three|twelve|twenty|twentyeight|twentyfive|" +
     "twentyfour|twentynine|twentyone|twentyseven|twentysix|twentythree|twentytwo|two)$").r

  def coalesced(collection: String): String =
    CoalescedCollection.replaceAllIn(collection, "")

  private val coalescedNames = Map("agent_core:agentToDoArchive" -> "agent_core:agentToDo")

  def coalescedArchive(tableName: String): String =
    coalescedNames.getOrElse(tableName, tableName)
}
