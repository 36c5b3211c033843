package graft.core

import graft.core.Transforms.IdModification

/** The full per-record transform chain — the "query" the reference
  * engine answers for every NDJSON line (HBaseWriter.kt:136-258,
  * traced in repo:SURVEY.md §3.3):
  *
  *   unwrap _removed → unwrap _archived → normalize id (skip blank) →
  *   normalize the three optional dates → lastModified fallback →
  *   overwrite-back → re-encrypt record → envelope → version + rowkey →
  *   time filter (HBase path) + manifest line (manifest path)
  *
  * Pure: all nondeterminism (clock, uuid, IV) is injected, so the same
  * inputs give byte-identical outputs — which is also what makes Spark
  * task retries safe at scale (replayed partitions regenerate identical
  * keys/versions and the sink's existence filter dedups them).
  */
object RecordProcessor {

  /** Stable per-file inputs (reference: filename regex groups +
    * per-file batch data key, HBaseWriter.kt:103-121). */
  final case class FileContext(database: String,
                               uncoalescedCollection: String,
                               fileNumber: Int,
                               dataKey: Envelope.DataKeyResult) {
    val collectionAfterCoalesce: String = Transforms.coalesced(uncoalescedCollection)
    private val originalTableName = s"$database:$collectionAfterCoalesce".replace("-", "_")
    val tableName: String = Transforms.coalescedArchive(originalTableName)
    /** When the archive merge rewrote the table, the collection used in
      * envelope + manifest follows it (HBaseWriter.kt:113-117). */
    val collection: String =
      if (originalTableName != tableName) tableName.replaceFirst("^[^:]+:", "")
      else collectionAfterCoalesce
  }

  val FilenamePattern =
    "(?i)([\\w-]+)\\.([\\w-]+)\\.([0-9]+)\\.json\\.gz\\.enc$".r

  /** Parse `<db>.<collection>.<n>.json.gz.enc` (possibly path-prefixed). */
  def parseFilename(fileName: String): Option[(String, String, Int)] =
    FilenamePattern.findFirstMatchIn(fileName).map(m => (m.group(1), m.group(2), m.group(3).toInt))

  sealed trait SkipReason
  object SkipReason {
    final case class MissingId(idModification: IdModification) extends SkipReason
    final case class Malformed(error: String) extends SkipReason
  }

  /** F2 — static time-range filter with the 1980-epoch exemption
    * (FilterServiceImpl.kt:24-37). */
  sealed trait FilterStatus
  object FilterStatus {
    case object DoNotFilter extends FilterStatus
    case object FilterTooEarly extends FilterStatus
    case object FilterTooLate extends FilterStatus
  }

  final case class TimeFilter(earlierThan: Long = Long.MinValue, laterThan: Long = Long.MaxValue) {
    def status(version: Long): FilterStatus =
      if (version < earlierThan && version != DateFmt.EpochMillis) FilterStatus.FilterTooEarly
      else if (version > laterThan) FilterStatus.FilterTooLate
      else FilterStatus.DoNotFilter
  }

  final case class Processed(rowkey: Array[Byte],
                             version: Long,
                             envelope: String,
                             innerType: String,
                             manifestLine: String,
                             database: String,
                             collection: String,
                             tableName: String)

  /** Process one NDJSON line. Left = skip (F3 blank id / F4 malformed —
    * both logged-and-continue in the reference). */
  def processLine(line: String,
                  ctx: FileContext,
                  identity: Envelope.RunIdentity,
                  ivSource: () => Array[Byte]): Either[SkipReason, Processed] =
    try {
      val (afterRemoved, isRemoved) = Transforms.reformatRemoved(line)
      val (record, isArchived) = Transforms.reformatArchived(afterRemoved)

      val originalId = record.get("_id")
      val (id, idMod) = Transforms.normalisedId(originalId)
      if (id.trim.isEmpty || id == "null")
        return Left(SkipReason.MissingId(idMod))

      val (createdDateTime, createdModified) = Transforms.optionalDateTime(Transforms.CreatedField, record)
      val (removedDateTime, removedModified) = Transforms.optionalDateTime(Transforms.RemovedField, record)
      val (archivedDateTime, archivedModified) = Transforms.optionalDateTime(Transforms.ArchivedField, record)

      val (lastModified, lastModifiedSource) =
        Transforms.lastModifiedDateTime(record.get(Transforms.LastModifiedField), createdDateTime)

      // T8 — overwrite-back of modified fields (HBaseWriter.kt:161-183)
      if (idMod == IdModification.FlattenedMongoId)
        record.overwrite("_id", JStr(id))
      else if (idMod == IdModification.FlattenedInnerDate)
        record.overwrite("_id", Json.parseObject(id))
      if (lastModifiedSource != Transforms.LastModifiedField)
        record.overwrite(Transforms.LastModifiedField, JStr(lastModified))
      if (createdModified) record.overwrite(Transforms.CreatedField, JStr(createdDateTime))
      if (removedModified) record.overwrite(Transforms.RemovedField, JStr(removedDateTime))
      if (archivedModified) record.overwrite(Transforms.ArchivedField, JStr(archivedDateTime))

      val encryptionResult =
        Crypto.encrypt(ctx.dataKey.plaintextDataKey, Json.renderRecord(record).getBytes("UTF-8"), ivSource)

      val idWasModified = idMod == IdModification.FlattenedMongoId || idMod == IdModification.FlattenedInnerDate
      val idIsString = idMod == IdModification.UnmodifiedStringId || idMod == IdModification.FlattenedMongoId

      val produced = Envelope.produceMessageParts(
        record, id, idIsString, idWasModified,
        lastModified, lastModifiedSource,
        createdDateTime.trim.nonEmpty && createdModified,
        removedDateTime.trim.nonEmpty && removedModified,
        archivedDateTime.trim.nonEmpty && archivedModified,
        isRemoved, isArchived,
        encryptionResult, ctx.dataKey, ctx.database, ctx.collection, identity)
      val envelope = produced.envelope

      // The reference re-parses the envelope it just rendered to pull
      // @type / message.@type / message._id back out
      // (MessageUtils.kt:43-77). Every one of those is a value the
      // producer ALREADY holds: outer @type is the literal "HDI" the
      // template writes, innerType is the quoted `tpe` the reparse would
      // read back verbatim, and the id only needs its own ≤100-byte
      // rendered literal parsed — not the multi-KB envelope. Exception:
      // a tpe, string id, or lastModified carrying quote/backslash/
      // control characters renders an envelope the reparse would either
      // REJECT (invalid JSON → the record was a Malformed skip) or
      // escape-DECODE differently — those rare records take the full
      // reparse path so observable behavior is unchanged (the corpus
      // spec pins both routes). lastModified matters because it is the
      // only other record-derived string the template splices unescaped
      // ("_lastModifiedDateTime": "$lastModified") — a date-prefixed
      // value with trailing junk still version-parses (lenient), so
      // without this check an invalid envelope would ship as Ok.
      def escapeSensitive(v: String): Boolean =
        v.exists(c => c == '"' || c == '\\' || c < ' ')
      val (innerType, rowkey) =
        if (escapeSensitive(produced.innerType) || (idIsString && escapeSensitive(id)) ||
            escapeSensitive(lastModified)) {
          val envelopeJson = Json.parse(envelope) // throws → Malformed, as before
          (Versions.getType(envelopeJson), Rowkey.generateKeyFromEnvelope(envelopeJson))
        } else
          (produced.innerType,
            Rowkey.idToKeyObject(Json.parse(produced.messageIdJson))
              .map(Rowkey.generateKey).getOrElse(Array.emptyByteArray))
      val versionString = Versions.getVersion(innerType, lastModified, removedDateTime, archivedDateTime)
      val version = Versions.getTimestampAsLong(versionString)

      // W4 — manifest line (HBaseWriter.kt:250-258)
      val idForManifest = if (idIsString) id else Json.sortByKeyCompact(Json.parseObject(id))
      val incoming = if (idWasModified) Transforms.incomingId(originalId) else idForManifest
      val outerType = "HDI" // the envelope template's literal @type
      val manifestLine = CsvEscape.csv(CsvEscape.ManifestRecord(
        idForManifest, version, ctx.database, ctx.collection, "IMPORT", outerType, innerType, incoming))

      Right(Processed(rowkey, version, envelope, innerType, manifestLine,
        ctx.database, ctx.collection, ctx.tableName))
    } catch {
      case e: Exception => Left(SkipReason.Malformed(Option(e.getMessage).getOrElse(e.getClass.getName)))
    }
}
