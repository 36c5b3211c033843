package graft.core

/** Logical-timestamp (cell version) selection — reference K4/K5
  * (MessageUtils.kt:24-72).
  */
object Versions {
  val MongoImport = "MONGO_IMPORT"
  val MongoDelete = "MONGO_DELETE"

  /** K5 — `message.@type` of the envelope, defaulting MONGO_IMPORT. */
  def getType(envelope: JValue): String =
    (envelope match {
      case o: JObj => o.get("message")
      case _ => None
    }) match {
      case Some(m: JObj) =>
        m.get("@type") match {
          case Some(JStr(s)) => s
          case _ => MongoImport
        }
      case _ => MongoImport
    }

  /** K4 — which timestamp string becomes the version: deletes prefer
    * removed, then archived, then lastModified; everything else uses
    * lastModified (MessageUtils.kt:43-61). */
  def getVersion(innerType: String, lastModified: String, removedDateTime: String, archivedDateTime: String): String =
    innerType match {
      case MongoDelete =>
        if (removedDateTime.trim.nonEmpty) removedDateTime
        else if (archivedDateTime.trim.nonEmpty) archivedDateTime
        else lastModified
      case _ => lastModified
    }

  /** K4 — version string → epoch millis (two accepted formats). */
  def getTimestampAsLong(versionString: String): Long = DateFmt.timestampAsLong(versionString)
}
