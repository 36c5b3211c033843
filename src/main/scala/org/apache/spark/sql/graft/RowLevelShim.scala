package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.write.{RowLevelOperation, RowLevelOperationTable}

/** Access shim: [[RowLevelOperationTable]] — the wrapper the analyzer
  * puts around a mutation target's Table so its scan and write share
  * one RowLevelOperation — is `private[sql]`, so connector-side code
  * (graft.sources.MergeSourcePruning) cannot pattern-match it
  * directly. This object lives under `org.apache.spark.sql` purely to
  * unwrap it type-safely; nothing else of Spark's internals is
  * touched. */
object RowLevelShim {
  /** the operation a row-level-rewrite target relation carries, or
    * None for ordinary tables (e.g. the source side of a self-merge). */
  def operationOf(t: Table): Option[RowLevelOperation] = t match {
    case r: RowLevelOperationTable => Some(r.operation)
    case _ => None
  }
}
