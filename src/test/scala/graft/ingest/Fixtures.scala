package graft.ingest

import java.nio.file.{Path => JPath}

/** Test-scope face of [[FixtureDumps]] (main scope, shared with the q30
  * end-to-end correctness query so specs and the gate exercise
  * byte-identical inputs). */
object Fixtures {
  val fileKeyB64: String = FixtureDumps.fileKeyB64
  def baseRecord(declarationId: String, ms: Int): String = FixtureDumps.baseRecord(declarationId, ms)
  def dumpLines(db: String, coll: String, n: Int): Seq[String] = FixtureDumps.dumpLines(db, coll, n)
  def writeDumpFile(dir: JPath, db: String, coll: String, n: Int): Unit = FixtureDumps.writeDumpFile(dir, db, coll, n)
}
