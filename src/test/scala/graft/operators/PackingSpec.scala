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

  test("two-level packing: single giant group, chunked == unchunked byte-for-byte") {
    // one group of 1000 docs (the serialization case the refinement
    // exists for), sparse non-contiguous ids, varied token counts —
    // including chunk-boundary-straddling budgets
    val docs = (0 until 1000)
      .map(i => ("g", i.toLong * 3 + 7, i % 17 + 1))
      .toDF("src", "doc_id", "n")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("src", "doc_id", "n_tokens", "pack_id", "pack_offset")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val plain = canon(Packing.packAssignments(docs, col("src"),
      col("doc_id"), col("n"), budget = 512L))
    val chunked = Packing.packAssignments(docs, col("src"),
      col("doc_id"), col("n"), budget = 512L, chunkSize = 100L)
    assert(canon(chunked) == plain)
    assert(chunked.columns.toSeq ==
      Seq("src", "doc_id", "n", "n_tokens", "pack_id", "pack_offset"))
    // the heavy stage parallelizes: the local-prefix window partitions
    // by (group, chunk), not group alone — with one group and ~30
    // chunks the sort shuffle spreads over >1 partition
    val plan = chunked.queryExecution.executedPlan.toString
    assert(plan.contains("__pack_chunk"), plan)
    val npart = chunked
      .withColumn("pid", spark_partition_id())
      .select("pid").distinct().count()
    assert(npart > 1, s"expected the chunked path to use >1 partition, got $npart")
  }

  test("two-level packing property: chunked == unchunked across random shapes") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val nGroups = rnd.nextInt(3) + 1
      val docs = (0 until 200).map { i =>
        // i*10 + jitter keeps doc_id unique (the operator contract:
        // order must be unique within a group) but non-contiguous
        (s"g${rnd.nextInt(nGroups)}", i.toLong * 10 + rnd.nextInt(5),
          rnd.nextInt(300)) // includes 0-token docs
      }.toDF("src", "doc_id", "n")
      val budget = rnd.nextInt(500) + 1L
      val chunk = rnd.nextInt(40) + 1L
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("src", "doc_id", "n_tokens", "pack_id", "pack_offset")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val plain = canon(Packing.packAssignments(docs, col("src"),
        col("doc_id"), col("n"), budget))
      val two = canon(Packing.packAssignments(docs, col("src"),
        col("doc_id"), col("n"), budget, chunkSize = chunk))
      assert(two == plain, s"trial $trial: budget=$budget chunk=$chunk")
    }
  }

  test("two-level packing: null group and null order rows survive, chunked == unchunked") {
    // r7 advice: the chunked path's inner equi-join silently DROPPED
    // null-group rows (null never equi-matches), and a null order made
    // a null chunk with the same fate. Null-safe join + sentinel chunk
    // must make both paths byte-identical, nulls included.
    val docs = Seq[(Option[String], Option[java.lang.Long], Int)](
      (Some("g"), Some(1L), 6), (Some("g"), Some(2L), 3),
      (None, Some(5L), 4), (None, Some(7L), 2), // null group
      (Some("h"), None, 5), (Some("h"), Some(3L), 1) // null order in h
    ).toDF("src", "doc_id", "n")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("src", "doc_id", "n_tokens", "pack_id", "pack_offset")
      .collect().map(r => (r.get(0), r.get(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val plain = canon(Packing.packAssignments(docs, col("src"),
      col("doc_id"), col("n"), budget = 8L))
    val chunked = canon(Packing.packAssignments(docs, col("src"),
      col("doc_id"), col("n"), budget = 8L, chunkSize = 2L))
    assert(chunked == plain, s"chunked=$chunked plain=$plain")
    assert(chunked.size == 6, s"rows dropped: $chunked")
    // null order sorts first (nulls-first window order): doc_id=null in
    // h starts the stream at 0; doc_id=3 follows at offset 5
    assert(chunked.exists { case (s, d, _, p, o) =>
      s == "h" && d == null && p == 0L && o == 0L })
    assert(chunked.exists { case (s, d, _, p, o) =>
      s == "h" && d == 3L && p == 0L && o == 5L })
  }

  test("two-level packing: multiple groups and uneven chunk fill") {
    val docs = Seq(
      ("g", 1L, 6), ("g", 2L, 3), ("g", 3L, 4),
      ("h", 9L, 5), ("h", 11L, 2)
    ).toDF("src", "doc_id", "n")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("src", "doc_id", "pack_id", "pack_offset")
      .as[(String, Long, Long, Long)].collect().toSet
    // chunkSize 2: docs 1 and 11 share no chunk with their group peers
    val chunked = canon(Packing.packAssignments(docs, col("src"),
      col("doc_id"), col("n"), budget = 8L, chunkSize = 2L))
    assert(chunked == Set(
      ("g", 1L, 0L, 0L), ("g", 2L, 0L, 6L), ("g", 3L, 1L, 1L),
      ("h", 9L, 0L, 0L), ("h", 11L, 0L, 5L)))
  }
}
