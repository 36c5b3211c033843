package graft.core

/** W4 — manifest CSV encoding. Matches commons-text
  * `StringEscapeUtils.escapeCsv` (used by StreamingManifestWriter.kt:61):
  * a value is wrapped in double quotes iff it contains a comma, a double
  * quote, CR or LF; embedded quotes are doubled. The manifest line joins
  * eight escaped fields with `|`.
  */
object CsvEscape {

  def escapeCsv(value: String): String =
    if (value.exists(c => c == ',' || c == '"' || c == '\r' || c == '\n'))
      "\"" + value.replace("\"", "\"\"") + "\""
    else value

  final case class ManifestRecord(id: String,
                                  timestamp: Long,
                                  db: String,
                                  collection: String,
                                  source: String,
                                  outerType: String,
                                  innerType: String,
                                  originalId: String)

  /** One manifest CSV line incl. trailing newline — field order is
    * id|ts|db|collection|source|outerType|originalId|innerType
    * (StreamingManifestWriter.kt:58-59). */
  def csv(r: ManifestRecord): String =
    Seq(r.id, r.timestamp.toString, r.db, r.collection, r.source, r.outerType, r.originalId, r.innerType)
      .map(escapeCsv).mkString("", "|", "\n")

  def topicName(db: String, collection: String): String = s"db.$db.$collection"

  /** Manifest file name for one input file
    * (HBaseWriter.kt:124-127): `db.<db>.<collection>-%06d.csv` with the
    * UNcoalesced collection name. */
  def manifestFileName(db: String, uncoalescedCollection: String, fileNumber: Int): String =
    f"${topicName(db, uncoalescedCollection)}-$fileNumber%06d.csv"
}
