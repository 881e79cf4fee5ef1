package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextFunctionsSpec extends SparkTestBase {

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("tokens and counts") {
    assert(one(TextFunctions.tokenCount(lit("a b c"))) == 3)
    assert(one(TextFunctions.regexTokenCount(lit("Hello big world42"))) == 3) // ello, big, world
  }

  test("word shingles: size-n+1 shingles, empty when too short") {
    assert(one(TextFunctions.wordShingles(lit("a b c d"), 3)) ==
      Seq("a b c", "b c d"))
    assert(one(TextFunctions.wordShingles(lit("a b"), 3)) == Seq())
  }

  test("repetitionStats: [total, distinct, maxCount] over word n-grams") {
    // "a b a b a" 2-grams: [a b, b a, a b, b a] -> total 4, distinct 2, max 2
    assert(one(TextFunctions.repetitionStats(lit("a b a b a"), 2)) ==
      Seq(4, 2, 2))
    // 3-grams: [a b a, b a b, a b a] -> total 3, distinct 2, max 2
    assert(one(TextFunctions.repetitionStats(lit("a b a b a"), 3)) ==
      Seq(3, 2, 2))
    // all-distinct document: max count 1, zero duplicate fraction
    assert(one(TextFunctions.repetitionStats(lit("w x y z"), 2)) ==
      Seq(3, 3, 1))
    // shorter than n: [0, 0, 0], not a crash or a negative total
    assert(one(TextFunctions.repetitionStats(lit("a"), 2)) == Seq(0, 0, 0))
  }

  test("char shingles") {
    assert(one(TextFunctions.charShingles(lit("abcd"), 3)) == Seq("abc", "bcd"))
    assert(one(TextFunctions.charShingles(lit("ab"), 3)) == Seq())
  }

  test("avg token length is exact (chars minus separators over tokens)") {
    assert(one(TextFunctions.avgTokenLength(lit("ab cdef"))) == 3.0)
  }

  test("stopword count and ratio") {
    val stops = TextFunctions.DefaultStopwords
    assert(one(TextFunctions.stopwordCount(lit("the cat is on the mat"), stops)) == 4)
  }

  test("langId picks the language with most marker hits; ties -> earliest") {
    assert(one(TextFunctions.langId(lit("the cat and the dog is here"))) == "en")
    assert(one(TextFunctions.langId(lit("der hund und die katze ist"))) == "de")
    assert(one(TextFunctions.langId(lit("xyzzy plugh"))) == "en") // all-zero tie
  }

  test("quality score stays in [0,1]") {
    Seq("", "the quick brown fox is on the run for a very long time today",
      "x", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa").foreach { t =>
      val q = one(TextFunctions.qualityScore(lit(t))).asInstanceOf[Double]
      assert(q >= 0.0 && q <= 1.0, s"quality($t) = $q")
    }
  }

  test("tokenOccurrences counts exact-equal tokens") {
    assert(one(TextFunctions.tokenOccurrences(lit("the cat the hat"), "the")) == 2)
    assert(one(TextFunctions.tokenOccurrences(lit("theme theater"), "the")) == 0)
  }

  test("vocab_stats query: token mass, types, hapax per source") {
    import graft.TestSpark.spark.implicits._
    val docs = Seq(
      ("a", "x y x z"),   // src a: 4 tokens, types {x:2,y:1,z:1}, hapax 2
      ("a", "x"),         //        +1 token -> x:3
      ("b", "p q")        // src b: 2 tokens, 2 types, 2 hapax
    ).toDF("source", "text")
    // same shape as the registered vocab_stats query, inlined over the
    // fixture (the registered one binds to the documents table)
    val got = docs
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("source"))
      .agg(sum(col("__cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("__cnt") === 1L, lit(1))).as("n_hapax"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((5L, 3L, 2L)))
    assert(got("b") == ((2L, 2L, 2L)))
  }
}
