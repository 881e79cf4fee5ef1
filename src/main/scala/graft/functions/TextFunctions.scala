package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, shingling, quality features, language-ID heuristic.
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen-friendly, no UDFs — so filters stay inside whole-stage codegen
  * and push down where possible.
  */
object TextFunctions {

  /** Whitespace tokens (single-space delimiter, keeps empties — matches
    * `string_split` semantics in ANSI engines).
    */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: maximal runs matching `pattern` (default:
    * lowercase words). Uses RE2-safe syntax so results agree across
    * regex engines.
    */
  def regexTokenCount(c: Column, pattern: String = "[a-z]+"): Column =
    if (pattern == "[a-z]+") Kernels.asciiRunCountCol(c) // codegen fast path
    else size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Word n-gram shingles joined by single spaces; empty array when the
    * document has fewer than `n` tokens (guard needed because
    * `sequence(1, k)` with k < 1 would produce a DESCENDING range).
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => array_join(slice(toks, i, lit(n)), " "))
    ).otherwise(array().cast("array<string>"))
  }

  /** Character n-gram shingles. */
  def charShingles(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - n + 1), i => c.substr(i, lit(n)))
    ).otherwise(array().cast("array<string>"))

  /** Occurrences of exactly-equal token `w`. */
  def tokenOccurrences(c: Column, w: String): Column =
    size(filter(tokens(c), t => t === lit(w)))

  /** Word n-gram repetition stats [total, distinct, maxCount] — the
    * Gopher-style repetitious-document signals, as a per-row codegen
    * kernel (zero shuffle). See [[Kernels.repetition]].
    */
  def repetitionStats(c: Column, n: Int): Column =
    Kernels.repetitionCol(tokens(c), n)

  /** Training-corpus text normalization: lowercase, strip everything but
    * letters/digits/spaces, collapse whitespace runs, trim. Pure builtin
    * composition (codegen'd, pushdown-friendly).
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** PII scrubbing for training corpora: masks URLs, then email
    * addresses, then long digit runs (phone/account numbers) with typed
    * placeholder tokens. Order matters — URLs can embed both `@` and
    * digits, so they are consumed first; the placeholders themselves
    * contain neither, so no pass re-masks another's output. Patterns are
    * RE2-safe (no backrefs/lookarounds), so decontamination audits in
    * other engines reproduce the transform byte-for-byte. Three
    * codegen'd regexp_replace passes, per-row, no shuffle.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "https?://[^ ]+", "<URL>"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{6,}", "<NUM>")

  // --- quality features ---------------------------------------------------

  /** Mean token length over single-space tokens, exact arithmetic:
    * (chars - separators) / tokens.
    */
  def avgTokenLength(c: Column): Column =
    (length(c) - (tokenCount(c) - 1)).cast("double") / tokenCount(c).cast("double")

  // kernel, not filter(tokens, isin): the HOF form evaluates the isin
  // lambda INTERPRETED per token
  def stopwordCount(c: Column, stops: Seq[String]): Column =
    Kernels.tokenSetCountCol(c, stops)

  def stopwordRatio(c: Column, stops: Seq[String]): Column =
    stopwordCount(c, stops).cast("double") / tokenCount(c).cast("double")

  /** Default English function-word list used by the quality score. */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** Composite quality score in [0,1]: presence of stopwords, sane mean
    * token length, and non-trivial size. Deterministic double arithmetic.
    */
  def qualityScore(c: Column): Column = {
    val stopOk = least(stopwordRatio(c, DefaultStopwords) * lit(5.0), lit(1.0))
    val lenOk = when(avgTokenLength(c).between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    val sizeOk = least(tokenCount(c).cast("double") / lit(20.0), lit(1.0))
    (stopOk + lenOk + sizeOk) / lit(3.0)
  }

  // --- language ID ---------------------------------------------------------

  /** Marker function words per language for the n-gram/stopword heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "ru" -> Seq("и", "в", "не", "на", "что"))

  /** Heuristic language-ID: count marker-word hits per language, take the
    * argmax; ties (including the all-zero case) resolve to the earliest
    * language in [[LangMarkers]] order, so results are deterministic.
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> Kernels.tokenSetCountCol(c, markers)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.reverse.foldLeft(lit(LangMarkers.head._1)) { case (acc, (lang, s)) =>
      when(s === best, lit(lang)).otherwise(acc)
    }
  }
}
