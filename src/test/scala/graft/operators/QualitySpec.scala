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
}
