package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Port of the reference's only data-plane UDF, `sqbrackets`
  * (reference jhub_proc.py:133-146): parses a JupyterHub log line of the
  * shape `"[I 2022-01-01 00:00:00.123 JupyterHub app:123] message"` into
  * (head, timestamp, service, type, code, msg).
  *
  * Fallback semantics are preserved exactly: on ANY parse failure the
  * result is five empty strings plus the whole input line as msg. Quirks
  * kept on purpose:
  *   - `msg` is taken at offset `len(bracketBody) + 2` from the START of
  *     the line (the reference assumes '[' is at position 0); for lines
  *     with a prefix before '[' the offset is off by that prefix length,
  *     and we reproduce that.
  *   - A missing ']' does NOT fail: everything after '[' becomes the
  *     bracket body (Python `s.split(']')[0]` of a string with no ']').
  */
object LogParse {

  def sqbrackets(sin: String): Seq[String] = {
    if (sin == null) return null
    try {
      val afterBracket = sin.split("\\[", 2) match {
        case arr if arr.length > 1 => arr(1)
        case _                     => throw new NoSuchElementException
      }
      val s = afterBracket.split("\\]", -1)(0)
      val msg = sin.drop(s.length + 2).trim // safe drop = Python slice semantics
      val toks = s.split("\\s+").filter(_.nonEmpty) // Python str.split()
      if (toks.length < 5) throw new NoSuchElementException
      val head = toks(0)
      val ts = toks(1) + " " + toks(2)
      val svc = toks(3)
      val typeCode = toks(4).split(":", -1)
      if (typeCode.length < 2) throw new NoSuchElementException
      Seq(head, ts, svc, typeCode(0), typeCode(1), msg)
    } catch {
      case _: Exception => Seq("", "", "", "", "", sin)
    }
  }

  /** Spark UDF form, ArrayType(StringType) like the reference's
    * registration (jhub_proc.py:148).
    */
  val sqbracketsUdf = udf(sqbrackets _)

  def sqbracketsCol(c: Column): Column = sqbracketsUdf(c)
}
