package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object operators {

  /** Backtick-quote an identifier for safe splicing into SQL text:
    * names with dots, spaces, or reserved keywords parse as one literal
    * identifier. */
  private[operators] def quoteIdent(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Backtick-quoted column ref — the whole name resolves as one
    * literal identifier. */
  private[operators] def qcol(name: String): Column = col(quoteIdent(name))
}
