package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PackingSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  test("packAssignments: exclusive running positions chunked by budget") {
    // group g: token counts 6, 3, 4 in doc_id order, budget 8 ->
    // starts at 0 (pack 0, off 0), 6 (pack 0, off 6), 9 (pack 1, off 1)
    val docs = Seq(
      ("g", 1L, 6), ("g", 2L, 3), ("g", 3L, 4),
      ("h", 9L, 5) // independent group restarts at zero
    ).toDF("src", "doc_id", "n")
    val got = Packing.packAssignments(docs, col("src"), col("doc_id"),
        col("n"), budget = 8L)
      .select("src", "doc_id", "pack_id", "pack_offset")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("g", 1L, 0L, 0L), ("g", 2L, 0L, 6L), ("g", 3L, 1L, 1L),
      ("h", 9L, 0L, 0L)))
  }

  test("packAssignments: straddle detection gates docs crossing a window boundary") {
    val docs = Seq(("g", 1L, 6), ("g", 2L, 3), ("g", 3L, 4))
      .toDF("src", "doc_id", "n")
    val packed = Packing.packAssignments(docs, col("src"), col("doc_id"),
      col("n"), budget = 8L)
    // doc 2 starts at offset 6 with 3 tokens -> crosses the 8-token edge
    val straddlers = packed
      .filter(col("pack_offset") + col("n_tokens") > 8)
      .select("doc_id").as[Long].collect().toSeq
    assert(straddlers == Seq(2L))
  }

  test("packAssignments rejects a non-positive budget") {
    val docs = Seq(("g", 1L, 6)).toDF("src", "doc_id", "n")
    intercept[IllegalArgumentException] {
      Packing.packAssignments(docs, col("src"), col("doc_id"), col("n"), 0L)
    }
  }
}
