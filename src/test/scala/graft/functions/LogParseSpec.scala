package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** F8: exact port of the reference UDF (jhub_proc.py:133-146), incl. the
  * all-or-nothing fallback and the offset quirks.
  */
class LogParseSpec extends AnyFunSuite {

  test("conforming JupyterHub line parses into 6 parts") {
    val r = LogParse.sqbrackets(
      "[I 2022-03-01 10:11:12.345 JupyterHub app:123] GET /hub/home")
    assert(r == Seq("I", "2022-03-01 10:11:12.345", "JupyterHub", "app",
      "123", "GET /hub/home"))
  }

  test("no opening bracket falls back to 5 empties + whole line") {
    val line = "plain log line with no brackets"
    assert(LogParse.sqbrackets(line) == Seq("", "", "", "", "", line))
  }

  test("missing type:code colon falls back") {
    val line = "[I 2022-03-01 10:11:12.345 JupyterHub app] msg"
    assert(LogParse.sqbrackets(line) == Seq("", "", "", "", "", line))
  }

  test("too few bracket tokens falls back") {
    val line = "[I 2022-03-01] msg"
    assert(LogParse.sqbrackets(line) == Seq("", "", "", "", "", line))
  }

  test("missing ']' does NOT fail (Python split(']')[0] semantics)") {
    // bracket body = rest of line; the 5th whitespace token still splits
    // on ':' and msg (offset past the line end) is empty
    val r = LogParse.sqbrackets("[I 2022-03-01 10:11:12.345 JupyterHub app:1 x")
    assert(r == Seq("I", "2022-03-01 10:11:12.345", "JupyterHub", "app", "1", ""))
  }

  test("prefix before '[' keeps the reference's off-by-prefix msg offset") {
    // Python takes msg at len(body)+2 from line START, assuming '[' at 0;
    // a 2-char prefix shifts the msg slice 2 chars left of the real tail.
    val py = LogParse.sqbrackets(
      "XX[I 2022-03-01 10:11:12.345 JupyterHub app:1] hello")
    assert(py(5) == "1] hello")
    assert(py(0) == "I" && py(4) == "1")
  }

  test("property: any line without '[' round-trips as fallback") {
    val gen = Gen.asciiPrintableStr.map(_.replace("[", ""))
    (0 until 200).foreach { i =>
      val s = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(LogParse.sqbrackets(s) == Seq("", "", "", "", "", s))
    }
  }

  test("null input stays null (Spark UDF null contract)") {
    assert(LogParse.sqbrackets(null) == null)
  }
}
