package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ChunkingSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("non-overlapping chunks (stride = chunk) reconstruct the document") {
    val text = "abcdefghij" * 7 + "tail" // 74 chars, chunk 10 -> 7 full + 1 short
    val d = docs((1L, text))
    val got = Chunking.chunkDocuments(d, col("doc_id"), col("text"), 10, 10)
      .orderBy("chunk_idx")
      .as[(Long, Int, Int, String, Int)].collect()
    assert(got.length == 8)
    assert(got.map(_._4).mkString == text)
    assert(got.map(_._2).toSeq == (0 until 8))
    assert(got.map(_._3).toSeq == (0 until 8).map(_ * 10))
    assert(got.last._4 == "tail" && got.last._5 == 4)
  }

  test("overlapping windows: every position covered, overlap region duplicated") {
    val text = "0123456789abcdefghij" // 20 chars, chunk 8, stride 5
    val got = Chunking.chunkDocuments(docs((1L, text)), col("doc_id"),
      col("text"), 8, 5)
      .orderBy("chunk_idx").as[(Long, Int, Int, String, Int)].collect()
    // starts 0,5,10,15 — last one short (5 chars)
    assert(got.map(_._3).toSeq == Seq(0, 5, 10, 15))
    assert(got.map(_._4).toSeq == Seq("01234567", "56789abc", "abcdefgh", "fghij"))
    // coverage: union of [start, start+len) is the whole doc
    val covered = got.flatMap(c => c._3 until (c._3 + c._5)).toSet
    assert(covered == (0 until text.length).toSet)
  }

  test("short, empty and null documents") {
    val d = Seq[(Long, Option[String])](
      (1L, Some("ab")),      // shorter than chunk -> one short window
      (2L, Some("")),        // empty -> no rows
      (3L, None)             // null -> no rows
    ).toDF("doc_id", "text")
    val got = Chunking.chunkDocuments(d, col("doc_id"), col("text"), 10, 10)
      .as[(Long, Int, Int, String, Int)].collect()
    assert(got.toSeq == Seq((1L, 0, 0, "ab", 2)))
  }

  test("chunkStats: counts, overlap-inflated chars, coverage bound") {
    val text = "0123456789abcdefghij" // 20 chars, chunk 8, stride 5
    val got = Chunking.chunkStats(docs((1L, text), (2L, "xy")),
      col("doc_id"), col("text"), 8, 5)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    // doc 1: 4 windows of 8,8,8,5 chars; covered_to = max(start+len) = 20
    assert(got(0) == ((1L, 4L, 29L, 20)))
    assert(got(1) == ((2L, 1L, 2L, 2)))
  }

  test("token windows: slice bounds, rejoin, and the empty-token contract") {
    val text = "a b c d e f g" // 7 tokens, chunk 3, stride 2
    val got = Chunking.chunkByTokens(docs((1L, text)), col("doc_id"),
      col("text"), 3, 2)
      .orderBy("chunk_idx").as[(Long, Int, Int, String, Int)].collect()
    assert(got.map(_._3).toSeq == Seq(0, 2, 4, 6))
    assert(got.map(_._4).toSeq == Seq("a b c", "c d e", "e f g", "g"))
    assert(got.map(_._5).toSeq == Seq(3, 3, 3, 1))
    // stride = chunk: windows rejoin to the document
    val nonOv = Chunking.chunkByTokens(docs((1L, text)), col("doc_id"),
      col("text"), 2, 2)
      .orderBy("chunk_idx").as[(Long, Int, Int, String, Int)].collect()
    assert(nonOv.map(_._4).mkString(" ") == text)
    // an empty document is ONE empty token (tokenCount contract), a
    // null document is no rows
    val edge = Seq[(Long, Option[String])]((1L, Some("")), (2L, None))
      .toDF("doc_id", "text")
    val e = Chunking.chunkByTokens(edge, col("doc_id"), col("text"), 3, 2)
      .as[(Long, Int, Int, String, Int)].collect()
    assert(e.toSeq == Seq((1L, 0, 0, "", 1)))
  }

  test("invalid parameters rejected") {
    val d = docs((1L, "abc"))
    intercept[IllegalArgumentException] {
      Chunking.chunkDocuments(d, col("doc_id"), col("text"), 0, 1)
    }
    intercept[IllegalArgumentException] {
      // stride > chunk would skip characters between windows
      Chunking.chunkDocuments(d, col("doc_id"), col("text"), 5, 6)
    }
  }
}
