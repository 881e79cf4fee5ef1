package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QualitySpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private def flags(rows: (Long, String)*) =
    Quality.gopherQualityFlags(rows.toDF("doc_id", "text"),
      col("doc_id"), col("text"))

  private val fiftyGood = // 50 words, all alphabetic, stopword-rich
    (Seq.fill(25)("the") ++ Seq.fill(25)("with")).mkString(" ")

  test("a clean 50-word document passes every rule") {
    val row = flags((1L, fiftyGood)).as[
      (Long, Int, Double, Double, Double, Int,
        Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].head()
    assert(row._2 == 50)           // n_words
    assert(row._3 == (25 * 3 + 25 * 4) / 50.0) // mean word len: the/with
    assert(row._4 == 0.0 && row._5 == 1.0)     // symbols, alpha
    assert(row._6 == 50)           // every token is a Gopher stopword
    assert(row._7 && row._8 && row._9 && row._10 && row._11 && row._12)
  }

  test("each rule fails independently on a targeted document") {
    val tooShort = "the of and that have with be to" // 8 words < 50
    val longWords = Seq.fill(50)("encyclopaedias").mkString(" ") // mean 14
    val symbols = (Seq.fill(40)("the") ++ Seq.fill(10)("####")).mkString(" ")
    val nonAlpha = (Seq.fill(35)("the") ++ Seq.fill(15)("123")).mkString(" ")
    val noStops = Seq.fill(50)("word").mkString(" ")
    val got = flags((1L, tooShort), (2L, longWords), (3L, symbols),
        (4L, nonAlpha), (5L, noStops))
      .select("doc_id", "flag_words", "flag_word_len", "flag_symbols",
        "flag_alpha", "flag_stopwords", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    // (doc_id, flag_words, flag_word_len, flag_symbols, flag_alpha,
    //  flag_stopwords, keep)
    assert(got(0) == ((1L, false, true, true, true, true, false)))
    assert(got(1) == ((2L, true, false, true, true, false, false)))
    // 40 'the' + 10 '####': alpha = 40/50 = 0.8 passes (inclusive);
    // 40 hashes / 50 words = 0.8 symbol ratio fails
    assert(got(2) == ((3L, true, true, false, true, true, false)))
    assert(got(3) == ((4L, true, true, true, false, true, false)))
    assert(got(4) == ((5L, true, true, true, true, false, false)))
  }

  test("ellipsis forms count as symbols: '...' (3 chars) and '…'") {
    // 10 words, two of them ellipses -> symbol_ratio 0.2
    val text = "a b c d e f g h ... …"
    val r = flags((1L, text)).select("symbol_ratio").as[Double].head()
    assert(r == 2.0 / 10.0)
  }

  test("repetitionFlags: degenerate repetition trips the paper thresholds") {
    val looped = Seq.fill(30)("spam ham").mkString(" ") // 'spam ham' x30
    val clean = (1 to 60).map(i => s"w$i").mkString(" ") // all distinct
    val got = Quality.repetitionFlags(
        Seq((1L, looped), (2L, clean)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .select("doc_id", "top_2gram_frac", "dup_5gram_frac", "keep")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1)
    // looped: 59 bigrams, 'spam ham' occurs 30x -> top frac 30/59 > 0.2;
    // 56 5-grams but only 2 distinct -> dup frac 54/56 > 0.15
    assert(got(0)._2 == 30.0 / 59.0)
    assert(got(0)._3 == 54.0 / 56.0)
    assert(!got(0)._4)
    // clean: every n-gram unique -> top fracs 1/total, dup fracs 0
    assert(got(1)._2 == 1.0 / 59.0)
    assert(got(1)._3 == 0.0)
    assert(got(1)._4)
  }

  test("repetitionFlags: docs shorter than n pass that rule with frac 0") {
    val got = Quality.repetitionFlags(
        Seq((1L, "only three words")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .select("top_4gram_frac", "dup_5gram_frac", "flag_top_4",
        "flag_dup_10", "top_2gram_frac", "keep")
      .as[(Double, Double, Boolean, Boolean, Double, Boolean)].head()
    // n > 3 rules have no grams: frac 0, rule passes
    assert(got._1 == 0.0 && got._2 == 0.0 && got._3 && got._4)
    // but the SMALL-n rules do fire on a 3-token doc: the single top
    // bigram covers 1/2 of 2 bigrams (> 0.2), so keep is false
    assert(got._5 == 0.5 && !got._6)
  }

  test("drop histogram counts non-exclusive failures and survivors") {
    val got = Quality.gopherDropHistogram(flags(
        (1L, fiftyGood),
        (2L, "short doc"),                       // fails words + stopwords
        (3L, Seq.fill(50)("word").mkString(" ")) // fails stopwords only
      )).as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // (n_docs, n_keep, fail_words, fail_word_len, fail_symbols,
    //  fail_alpha, fail_stopwords)
    assert(got == ((3L, 1L, 1L, 0L, 0L, 0L, 2L)))
  }

  test("logisticQualityScore: hand-computed logit, squash and threshold") {
    // "the the": alpha_frac 1, stop_frac 1, symbol_ratio 0, mean len 3
    val got = Quality.logisticQualityScore(
        Seq((1L, "the the")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, Double, Double, Double, Double, Double, Double, Boolean)]
      .head()
    val w = Quality.DefaultLogitWeights
    val logit = w.bias + w.alphaFrac * 1.0 + w.stopFrac * 1.0 +
      w.symbolRatio * 0.0 + w.meanWordLen * 3.0
    assert(got._6 == logit)
    assert(got._7 == logit / (1.0 + math.abs(logit)))
    assert(got._8 == (got._7 >= 0.5))
  }

  test("logisticQualityScore: symbol-heavy text scores below threshold") {
    // 4 words, 8 hashes: symbol_ratio 2.0 dominates via its -7.5 weight
    val scored = Quality.logisticQualityScore(
        Seq((1L, "#### #### the words")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .select("quality_score", "keep").as[(Double, Boolean)].head()
    assert(scored._1 < 0.0 && !scored._2)
  }

  test("corpusReport: per-source counts, dups, tokens and both gates") {
    val docs = Seq(
      (1L, fiftyGood, "srcA"),        // passes gopher
      (2L, fiftyGood, "srcA"),        // exact dup of 1
      (3L, "short doc", "srcA"),      // fails gopher (words)
      (4L, Seq.fill(60)("the").mkString(" "), "srcB")
    ).toDF("doc_id", "text", "source")
    val got = Quality.corpusReport(docs, col("source"), col("text"))
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    // srcA: 3 docs, 2 distinct texts, 1 dup, 50+50+2 tokens, 2 gopher
    assert(got(0)._1 == "srcA" && got(0)._2 == 3 && got(0)._3 == 2 &&
      got(0)._4 == 1 && got(0)._5 == 102 && got(0)._6 == 2)
    assert(got(1)._1 == "srcB" && got(1)._2 == 1 && got(1)._4 == 0 &&
      got(1)._5 == 60 && got(1)._6 == 1)
    // the logit gate keeps every all-stopword doc (alpha 1, stop-rich)
    assert(got(0)._7 >= 2 && got(1)._7 == 1)
  }

  test("logisticQualityScore: squash is monotone in the logit") {
    // cleaner document (more stopwords) never scores lower
    val rows = Seq((1L, "the of and that have with all stop words here"),
      (2L, "zz qq xx vv kk jj ww yy uu oo"))
    val got = Quality.logisticQualityScore(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .orderBy("doc_id").select("quality_score").as[Double].collect()
    assert(got(0) > got(1))
  }

  // ---- C4 page cleaning --------------------------------------------------

  private def c4(pages: Seq[(Long, String)], minSentences: Int = 5) = {
    import graft.TestSpark.spark.implicits._
    Quality.c4PageFilter(pages.toDF("doc_id", "text"), col("doc_id"),
        col("text"), minSentences = minSentences)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("c4PageFilter: line rules — terminal punctuation, min words, " +
    "javascript") {
    val page = Seq(
      "this line ends with a period.",   // kept
      "no terminal punctuation here",    // dropped: punct
      "too short.",                      // dropped: 2 words
      "enable javascript to continue.",  // dropped: javascript
      "is this a question?",             // kept
      "quoted line ends well.\"",        // kept: closing quote
      "").mkString("\n")                 // dropped: empty
    val r = c4(Seq((1L, page)), minSentences = 1)(1L)
    assert(r.getInt(1) == 7)  // n_lines
    assert(r.getInt(2) == 3)  // n_kept_lines
    assert(r.getString(3) ==
      "this line ends with a period.\nis this a question?\n" +
        "quoted line ends well.\"")
    // sentences in CLEAN text: 1 period + 1 question mark + 1 period
    // inside the quoted line = 3
    assert(r.getInt(4) == 3)
    assert(r.getBoolean(8)) // keep: >=1 sentence, no lorem, no brace
  }

  test("c4PageFilter: page rules — lorem ipsum, braces, min sentences") {
    val five = (1 to 5).map(i => s"sentence number $i is here.")
      .mkString("\n")
    val out = c4(Seq(
      (1L, five),                                   // keep
      (2L, five + "\nLorem Ipsum dolor sit amet."), // lorem (case-blind)
      (3L, five + "\nfunction f() { return 1; }"),  // brace
      (4L, (1 to 4).map(i => s"only sentence $i here.").mkString("\n"))))
    assert(out(1L).getBoolean(8))
    assert(!out(2L).getBoolean(8) && out(2L).getBoolean(5))
    assert(!out(3L).getBoolean(8) && out(3L).getBoolean(6))
    assert(!out(4L).getBoolean(8) && !out(4L).getBoolean(7)) // 4 < 5
  }

  test("c4PageFilter: single-line page degenerates to one line; " +
    "dropped lines contribute no sentences") {
    val out = c4(Seq((1L, "a single unpunctuated page like the corpus")))
    val r = out(1L)
    assert(r.getInt(1) == 1 && r.getInt(2) == 0)
    assert(r.getString(3) == "" && r.getInt(4) == 0)
    assert(!r.getBoolean(8))
  }

  test("calibrateAcrossGroups makes per-source ranks comparable") {
    import graft.TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.col
    // source A scores cluster high, source B low — a global threshold
    // at 0.5 would keep all of A and none of B; calibrated ranks put
    // the same fraction of each source above any cut
    val rows = Seq(
      (1L, "A", 0.9), (2L, "A", 0.8), (3L, "A", 0.7), (4L, "A", 0.6),
      (5L, "B", 0.4), (6L, "B", 0.3), (7L, "B", 0.2), (8L, "B", 0.1)
    ).toDF("id", "src", "q")
    val cal = Quality.calibrateAcrossGroups(rows, col("id"), col("src"),
        col("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // within each group: ranks 0, 1/3, 2/3, 1 by ascending score
    assert(cal(4L) == 0.0 && cal(1L) == 1.0)
    assert(cal(8L) == 0.0 && cal(5L) == 1.0)
    assert(cal(3L) == 1.0 / 3 && cal(6L) == 2.0 / 3)
    // ties share the min rank (ANSI percent_rank)
    val tied = Quality.calibrateAcrossGroups(
        Seq((1L, "A", 0.5), (2L, "A", 0.5), (3L, "A", 0.9))
          .toDF("id", "src", "q"), col("id"), col("src"), col("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(tied(1L) == 0.0 && tied(2L) == 0.0 && tied(3L) == 1.0)
  }
}
