package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Kernels, TextFunctions}

/** Gopher-style document-quality rule filters (Rae et al. 2021,
  * "Scaling Language Models: Methods, Analysis & Insights from Training
  * Gopher", Appendix A1.1) — the standard pre-training corpus gate:
  * hard per-document thresholds on word count, mean word length,
  * symbol-to-word ratio, alphabetic-word fraction and stopword
  * presence. Every rule is emitted as its own boolean flag plus the
  * underlying measurement, so a pipeline can audit WHY a document was
  * dropped (the flags are the drop-reason histogram) and re-cut
  * thresholds without recomputing features.
  *
  * Scale shape: pure projection — ZERO shuffle, every feature is either
  * a codegen'd one-pass kernel ([[Kernels.tokenSetCount]],
  * [[Kernels.alphaTokenCount]]) or a builtin length/replace
  * composition, so the gate rides the parquet scan and pushes column
  * pruning down (only the text + id columns are read). All counts are
  * integers and every ratio is a single IEEE division, so the flags
  * reproduce bit-for-bit in any ANSI engine — the operator is
  * oracle-checked end-to-end, not spot-tested.
  *
  * The reference's line-based rules (bullet-line and ellipsis-line
  * fractions) require a line structure the single-line test corpus
  * does not have; the symbol-to-word rule keeps their ellipsis term as
  * the '…'/'...' occurrence count, which is the same signal without
  * the line split.
  */
object Quality {

  /** Gopher A1.1 stopword list (the "contains at least `minStopwords`
    * of ..." rule uses these exact eight function words).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The shared Gopher feature expressions (all codegen'd, all exact:
    * integer counts and single IEEE divisions) — one definition feeding
    * the rule gate, the logit score and the corpus report so the three
    * can never diverge on what "symbol ratio" means.
    */
  private final case class Feats(nWords: Column, meanLen: Column,
                                 symbolRatio: Column, alphaFrac: Column,
                                 nStop: Column)

  private def feats(text: Column): Feats = {
    val nWords = TextFunctions.tokenCount(text)
    // occurrence counts via length deltas — builtin `replace` stays in
    // codegen and the integer arithmetic is engine-exact
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    // the '...' replace-delta is always a multiple of 3, so the double
    // division is exact and the int cast lossless (Spark `/` on ints is
    // IEEE division; the DuckDB twin's `// 3` lands on the same value)
    val nEllipsis =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3))
        .cast("int") +
        (length(text) - length(regexp_replace(text, "…", "")))
    val nAlpha = Kernels.alphaTokenCountCol(text)
    val nStop = Kernels.tokenSetCountCol(text, GopherStopwords)
    val meanLen = TextFunctions.avgTokenLength(text)
    Feats(nWords, meanLen,
      (nHash + nEllipsis).cast("double") / nWords.cast("double"),
      nAlpha.cast("double") / nWords.cast("double"),
      nStop)
  }

  /** The five Gopher rule predicates over a [[Feats]], in gate order —
    * THE single definition of the rules: [[gopherQualityFlags]] aliases
    * these as its flag columns, [[gopherKeep]] conjoins them, and
    * [[corpusReport]]/[[gopherKeepCol]] consume the conjunction, so an
    * edited threshold changes every consumer or none.
    */
  private def gopherRules(f: Feats, minWords: Int, maxWords: Int,
                          minMeanWordLen: Double, maxMeanWordLen: Double,
                          maxSymbolRatio: Double, minAlphaFrac: Double,
                          minStopwords: Int): Seq[Column] = Seq(
    f.nWords.between(minWords, maxWords),
    f.meanLen.between(minMeanWordLen, maxMeanWordLen),
    f.symbolRatio <= maxSymbolRatio,
    f.alphaFrac >= minAlphaFrac,
    f.nStop >= minStopwords)

  /** Paper-default rule conjunction over a [[Feats]]. */
  private def gopherKeep(f: Feats): Column =
    gopherRules(f, 50, 100000, 3.0, 10.0, 0.1, 0.8, 2).reduce(_ && _)

  /** Empty-document guard shared by every logit consumer: a 0-word doc
    * has undefined ratios (0/0 = NaN); scoring treats them as 0.
    */
  private def guardZero(f: Feats)(c: Column): Column =
    when(f.nWords > 0, c).otherwise(lit(0.0))

  /** THE fixed-order logit multiply-add chain — single definition so the
    * gate ([[logisticQualityScore]]), the report ([[corpusReport]]) and
    * the in-row form ([[logitScoreCol]]) can never diverge; the oracle
    * SQL renders the same term order.
    */
  private def logitChain(f: Feats, w: LogitWeights): Column = {
    val guard = guardZero(f) _
    lit(w.bias) +
      lit(w.alphaFrac) * guard(f.alphaFrac) +
      lit(w.stopFrac) * guard(f.nStop.cast("double") / f.nWords.cast("double")) +
      lit(w.symbolRatio) * guard(f.symbolRatio) +
      lit(w.meanWordLen) * f.meanLen
  }

  /** The exact IEEE rational sigmoid x / (1 + |x|) every logit consumer
    * squashes through.
    */
  private def rationalSigmoid(x: Column): Column = x / (lit(1.0) + abs(x))

  /** Per-document Gopher rule evaluation: measurements, one boolean per
    * rule, and the conjunction `keep`.
    *
    * Rules (defaults = the paper's):
    *  - `flag_words`: word count in [minWords, maxWords]
    *  - `flag_word_len`: mean word length in [minMeanWordLen, maxMeanWordLen]
    *  - `flag_symbols`: (hash + ellipsis occurrences) / words <= maxSymbolRatio
    *  - `flag_alpha`: fraction of words containing an ASCII letter >= minAlphaFrac
    *  - `flag_stopwords`: >= minStopwords hits from [[GopherStopwords]]
    */
  def gopherQualityFlags(docs: DataFrame, id: Column, text: Column,
                         minWords: Int = 50, maxWords: Int = 100000,
                         minMeanWordLen: Double = 3.0,
                         maxMeanWordLen: Double = 10.0,
                         maxSymbolRatio: Double = 0.1,
                         minAlphaFrac: Double = 0.8,
                         minStopwords: Int = 2): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1: $minWords")
    require(maxWords >= minWords, s"maxWords < minWords: $maxWords")
    val f = feats(text)
    val Seq(rWords, rWordLen, rSymbols, rAlpha, rStop) =
      gopherRules(f, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
        maxSymbolRatio, minAlphaFrac, minStopwords)
    docs.select(
      id.as("doc_id"),
      f.nWords.as("n_words"),
      f.meanLen.as("mean_word_len"),
      f.symbolRatio.as("symbol_ratio"),
      f.alphaFrac.as("alpha_frac"),
      f.nStop.as("n_stop"),
      rWords.as("flag_words"),
      rWordLen.as("flag_word_len"),
      rSymbols.as("flag_symbols"),
      rAlpha.as("flag_alpha"),
      rStop.as("flag_stopwords"))
      .withColumn("keep",
        col("flag_words") && col("flag_word_len") && col("flag_symbols") &&
          col("flag_alpha") && col("flag_stopwords"))
  }

  /** Gopher A1.1 repetition-rule thresholds: fraction covered by the
    * MOST FREQUENT n-gram for small n, fraction of DUPLICATED n-grams
    * for larger n (the paper's remove-if-above cutoffs).
    */
  val GopherTopNgramThresholds: Seq[(Int, Double)] =
    Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val GopherDupNgramThresholds: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The repetition half of the Gopher gate: per-document top-n-gram
    * coverage (n = 2..4) and duplicate-n-gram fractions (n = 5..10)
    * against the paper's thresholds, one flag per rule plus the
    * conjunction. Fractions are token-count based (the
    * [[graft.functions.Kernels.repetition]] signal — the paper measures
    * duplicated CHARACTERS; the token proxy needs no second pass and
    * flags the same degenerate documents); thresholds are the paper's.
    *
    * Scale shape: one codegen kernel pass per n over the per-row token
    * array — ZERO shuffle, like [[gopherQualityFlags]]; the oracle's
    * explode+groupBy formulation shuffles every n-gram of the corpus
    * per n to compute the same numbers. Documents with fewer than n
    * tokens have no n-grams: fraction 0, rule passes.
    */
  def repetitionFlags(docs: DataFrame, id: Column, text: Column,
                      topThresholds: Seq[(Int, Double)] = GopherTopNgramThresholds,
                      dupThresholds: Seq[(Int, Double)] = GopherDupNgramThresholds)
      : DataFrame = {
    require(topThresholds.nonEmpty || dupThresholds.nonEmpty,
      "at least one repetition rule is required")
    val toks = TextFunctions.tokens(text)
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    val top = topThresholds.map { case (n, thr) =>
      val r = Kernels.repetitionCol(toks, n)
      val f = frac(element_at(r, 3), element_at(r, 1))
      (f.as(s"top_${n}gram_frac"), (f <= thr).as(s"flag_top_$n"),
        s"flag_top_$n")
    }
    val dup = dupThresholds.map { case (n, thr) =>
      val r = Kernels.repetitionCol(toks, n)
      val f = frac(element_at(r, 1) - element_at(r, 2), element_at(r, 1))
      (f.as(s"dup_${n}gram_frac"), (f <= thr).as(s"flag_dup_$n"),
        s"flag_dup_$n")
    }
    val all = top ++ dup
    docs.select(id.as("doc_id") +: all.flatMap(c => Seq(c._1, c._2)): _*)
      .withColumn("keep", all.map(c => col(c._3)).reduce(_ && _))
  }

  /** Linear quality-classifier weights over the Gopher feature set —
    * the shape of a CCNet/RefinedWeb-style model-based filter (a linear
    * model over cheap per-document features), with fixed public
    * stand-in coefficients: a production run would drop in offline-
    * trained weights, and the operator's value is the scoring plan, not
    * these constants. All weights are small dyadic rationals (exactly
    * representable doubles), so the fused multiply-add chain reproduces
    * bit-for-bit in any IEEE engine.
    */
  final case class LogitWeights(bias: Double, alphaFrac: Double,
                                stopFrac: Double, symbolRatio: Double,
                                meanWordLen: Double)
  val DefaultLogitWeights: LogitWeights =
    LogitWeights(bias = -2.0, alphaFrac = 3.5, stopFrac = 1.25,
      symbolRatio = -7.5, meanWordLen = 0.0625)

  /** Classifier-style quality score: a linear logit over the rule
    * features, squashed through the RATIONAL sigmoid x / (1 + |x|)
    * instead of the logistic exp form — monotone-equivalent for
    * thresholding, and exact IEEE arithmetic (one division, no libm),
    * which is what lets the whole operator hash-match a DuckDB twin
    * rather than settle for a rows-only check. Features are the Gopher
    * measurements (each a single integer-over-integer division);
    * the logit is a fixed-order multiply-add chain, identical term
    * order in the generated oracle SQL.
    *
    * Scale shape: pure projection like [[gopherQualityFlags]] — ZERO
    * shuffle, every term codegen'd, rides the parquet scan.
    */
  def logisticQualityScore(docs: DataFrame, id: Column, text: Column,
                           w: LogitWeights = DefaultLogitWeights,
                           keepThreshold: Double = 0.5): DataFrame = {
    val f = feats(text)
    val guard = guardZero(f) _
    val alphaFrac = guard(f.alphaFrac)
    val stopFrac = guard(f.nStop.cast("double") / f.nWords.cast("double"))
    val symbolRatio = guard(f.symbolRatio)
    val logit = logitChain(f, w)
    val score = rationalSigmoid(logit)
    docs.select(
      id.as("doc_id"),
      alphaFrac.as("alpha_frac"),
      stopFrac.as("stop_frac"),
      symbolRatio.as("symbol_ratio"),
      f.meanLen.as("mean_word_len"),
      logit.as("logit"),
      score.as("quality_score"),
      (score >= keepThreshold).as("keep"))
  }

  /** The one-pass curation dashboard: per-source document counts,
    * intra-source exact-duplicate counts (n_docs − distinct texts),
    * token totals and survivor counts under BOTH gates (Gopher rules at
    * the paper defaults, logit at [[DefaultLogitWeights]] ≥ 0.5) — the
    * summary a daily corpus run reports.
    *
    * Scale shape: both gates are the same zero-shuffle feature
    * projection (no join between them — one scan computes every
    * column), then ONE aggregation by source; the distinct-text count
    * partial-aggregates map-side like any distinct. Every output is an
    * exact integer, so the whole dashboard is oracle-checkable.
    */
  def corpusReport(docs: DataFrame, source: Column, text: Column): DataFrame = {
    val f = feats(text)
    val gKeep = gopherKeep(f)
    val lKeep = rationalSigmoid(logitChain(f, DefaultLogitWeights)) >= 0.5
    docs.select(source.as("source"), text.as("__text"),
        f.nWords.as("__nw"), gKeep.as("__g"), lKeep.as("__l"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("__text")).as("n_distinct_texts"),
        (count(lit(1)) - countDistinct(col("__text"))).as("n_dup_docs"),
        sum(col("__nw").cast("long")).as("total_tokens"),
        sum(when(col("__g"), 1L).otherwise(0L)).as("gopher_keep"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("logit_keep"))
  }

  /** The Gopher rule conjunction as a single COLUMN over `text` — the
    * in-row form for contexts where a projection is all there is (a
    * streaming micro-batch gate, a WHERE clause, a CASE arm). Same
    * formulas and paper-default thresholds as [[gopherQualityFlags]]'
    * `keep`; use the DataFrame form when the per-rule audit columns
    * matter.
    */
  def gopherKeepCol(text: Column): Column = gopherKeep(feats(text))

  /** The rational-sigmoid quality score as a single COLUMN over `text`
    * — [[logisticQualityScore]]'s `quality_score` in in-row form, same
    * weights, same fixed-order chain.
    */
  def logitScoreCol(text: Column,
                    w: LogitWeights = DefaultLogitWeights): Column =
    rationalSigmoid(logitChain(feats(text), w))

  /** C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits
    * of Transfer Learning...", §2.2) — the line-level companion to the
    * document-level Gopher gate: per page, RETAIN only lines that end
    * in a terminal punctuation mark, contain at least `minWordsPerLine`
    * words and do not mention "javascript"; then DISCARD pages with
    * fewer than `minSentences` sentences after cleaning, any page
    * containing "lorem ipsum" and any page containing a curly brace
    * (code leakage). Emits the cleaned text plus every measurement and
    * flag so a pipeline can audit the drop reasons, like
    * [[gopherQualityFlags]].
    *
    * Scale shape: pure projection, ZERO shuffle. The line predicate
    * runs through a `filter` higher-order function — interpreted per
    * LINE, not per token, so the per-row constant is lines-per-page
    * (tens), unlike the token-loop kernels ([[graft.functions.Kernels]])
    * where interpretation was the bill. Every term is builtin string
    * arithmetic (last-char compare, single-space word split, substring
    * search, replace-delta counts) — no libm, no engine-specific hash —
    * so the full output is DuckDB-oracle-checkable.
    *
    * Sentence count = terminal-punctuation occurrences ('.', '!', '?')
    * in the CLEANED text — C4's "sentence" is delimiter-based (they
    * split on punctuation for the 3-sentence span dedup too); counting
    * after line filtering means a dropped boilerplate line contributes
    * no sentences, which is the paper's intent.
    */
  def c4PageFilter(docs: DataFrame, id: Column, text: Column,
                   minWordsPerLine: Int = 3,
                   minSentences: Int = 5): DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine >= 1: $minWordsPerLine")
    require(minSentences >= 0, s"minSentences >= 0: $minSentences")
    val lines = split(text, "\n", -1)
    val keptArr = filter(lines, l =>
      substring(l, -1, 1).isin(".", "!", "?", "\"", "'") &&
        size(split(l, " ", -1)) >= minWordsPerLine &&
        instr(lower(l), "javascript") === 0)
    val clean = array_join(keptArr, "\n")
    def occ(c: Column, pat: String): Column =
      length(c) - length(regexp_replace(c, pat, ""))
    val nSentences = occ(clean, "\\.") + occ(clean, "!") + occ(clean, "\\?")
    val hasLorem = instr(lower(text), "lorem ipsum") > 0
    val hasBrace = instr(text, "{") > 0
    docs.select(
        id.as("doc_id"),
        size(lines).as("n_lines"),
        size(keptArr).as("n_kept_lines"),
        clean.as("clean_text"),
        nSentences.as("n_sentences"),
        hasLorem.as("has_lorem_ipsum"),
        hasBrace.as("has_brace"),
        (nSentences >= minSentences).as("flag_sentences"))
      .withColumn("keep",
        col("flag_sentences") && !col("has_lorem_ipsum") && !col("has_brace"))
  }

  /** Drop-reason histogram over the flags — the corpus-level audit a
    * curation run reports: how many documents each rule rejects
    * (non-exclusive: a doc failing two rules counts under both) plus
    * the total and surviving counts. One map-side-combinable
    * aggregation over the zero-shuffle flag projection.
    */
  def gopherDropHistogram(flags: DataFrame): DataFrame = {
    def failed(c: String) = sum(when(!col(c), 1L).otherwise(0L))
    flags.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      failed("flag_words").as("fail_words"),
      failed("flag_word_len").as("fail_word_len"),
      failed("flag_symbols").as("fail_symbols"),
      failed("flag_alpha").as("fail_alpha"),
      failed("flag_stopwords").as("fail_stopwords"))
  }

  /** Cross-group score calibration by rank: replace a raw score with
    * its percent-rank WITHIN its group. Why: raw quality scores are
    * not comparable across heterogeneous sources (a webcrawl's 0.6
    * and a curated corpus's 0.6 mean different things), so a global
    * threshold silently over-prunes whole sources; rank-normalizing
    * per source makes "keep the top 30 %" mean the same thing
    * everywhere — the mixture-balancing prep DoReMi-style pipelines
    * do before thresholding. `percent_rank` is the ANSI
    * `(rank−1)/(n−1)` with ties sharing the min rank, so the output
    * is a deterministic exact rational of the group's row count.
    *
    * Scale shape: one exchange keyed on the group + a per-group
    * ordered window — the same shape as any per-group ranking; no
    * global sort.
    */
  def calibrateAcrossGroups(df: DataFrame, id: Column, group: Column,
                            score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("group")).orderBy(col("score"))
    df.select(id.as("id"), group.as("group"), score.as("score"))
      .withColumn("calibrated", percent_rank().over(w))
  }
}
