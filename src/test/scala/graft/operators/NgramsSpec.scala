package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class NgramsSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  test("trigram counts: corpus totals, doc frequencies, min support") {
    val docs = Seq(
      (1L, "a b c a b c"),   // 'a b c' x2, 'b c a', 'c a b'
      (2L, "a b c d"),       // 'a b c', 'b c d'
      (3L, "x y")            // no trigrams
    ).toDF("doc_id", "text")
    val got = Ngrams.ngramCounts(docs, col("doc_id"), col("text"),
        n = 3, minCount = 2L, k = 10)
      .as[(String, Long, Long)].collect()
    // only 'a b c' reaches cnt >= 2 (3 occurrences across 2 docs)
    assert(got.toSeq == Seq(("a b c", 2L, 3L)))
  }

  test("top-k cut is deterministic: count desc then gram asc") {
    val docs = Seq((1L, "p q p q r s r s")).toDF("doc_id", "text")
    val got = Ngrams.ngramCounts(docs, col("doc_id"), col("text"),
        n = 2, minCount = 1L, k = 3)
      .as[(String, Long, Long)].collect()
    // bigrams: 'p q' x2, 'q p' x1, 'q r' x1, 'r s' x2, 's r' x1
    assert(got.map(_._1).toSeq == Seq("p q", "r s", "q p"))
    assert(got.map(_._3).toSeq == Seq(2L, 2L, 1L))
  }

  test("unigram mode matches the vocabulary shape") {
    val docs = Seq((1L, "w w v"), (2L, "w")).toDF("doc_id", "text")
    val got = Ngrams.ngramCounts(docs, col("doc_id"), col("text"),
        n = 1, minCount = 2L, k = 10)
      .as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("w", 2L, 3L)))
  }
}
