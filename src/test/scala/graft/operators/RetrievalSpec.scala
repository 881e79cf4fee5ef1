package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private def arm(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "id", "rank")

  test("rrfFuse: hand-computed scores, arm overlap and tie-break") {
    val lex = arm((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val dense = arm((1L, 11L, 1), (1L, 13L, 2))
    val got = Retrieval.rrfFuse(Seq(lex, dense), k0 = 60, k = 10)
      .orderBy("rank")
      .as[(Long, Long, Long, Long, Int)].collect()
    def c(r: Int) = 1000000000L / (60 + r) // JVM long division == div
    // doc 11: both arms (rank 2 lex + rank 1 dense) — top fused
    assert(got(0) == ((1L, 11L, 2L, c(2) + c(1), 1)))
    assert(got(1) == ((1L, 10L, 1L, c(1), 2)))
    // 12 (lex r3) vs 13 (dense r2): 13 scores higher
    assert(got(2) == ((1L, 13L, 1L, c(2), 3)))
    assert(got(3) == ((1L, 12L, 1L, c(3), 4)))
  }

  test("rrfFuse: equal scores tie-break to the lower id") {
    val a = arm((1L, 7L, 1), (1L, 3L, 2))
    val b = arm((1L, 3L, 1), (1L, 7L, 2))
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .orderBy("rank").as[(Long, Long, Long, Long, Int)].collect()
    assert(got(0)._2 == 3L && got(1)._2 == 7L) // same score, id ASC
    assert(got(0)._4 == got(1)._4)
  }

  test("rrfFuseWeighted: a heavier arm outvotes a better rank") {
    val lex = arm((1L, 10L, 1), (1L, 11L, 2))
    val dense = arm((1L, 11L, 1), (1L, 10L, 2))
    // uniform weights tie 10 and 11 (mirror ranks) -> id ASC puts 10 first;
    // doubling the lexical arm's scale must put its #1 (doc 10) clearly top
    val uni = Retrieval.rrfFuse(Seq(lex, dense), k = 10)
      .orderBy("rank").as[(Long, Long, Long, Long, Int)].collect()
    assert(uni(0)._2 == 10L && uni(0)._4 == uni(1)._4)
    val weighted = Retrieval.rrfFuseWeighted(
        Seq(lex -> 2000000000L, dense -> 1000000000L), k = 10)
      .orderBy("rank").as[(Long, Long, Long, Long, Int)].collect()
    assert(weighted(0)._2 == 10L)
    assert(weighted(0)._4 > weighted(1)._4) // strictly, not a tie-break
  }

  test("rrfFuse: k cuts per query independently") {
    val a = arm((1L, 1L, 1), (1L, 2L, 2), (2L, 9L, 1))
    val got = Retrieval.rrfFuse(Seq(a), k = 1)
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    assert(got.map(r => (r._1, r._2)) == Set((1L, 1L), (2L, 9L)))
  }

  test("hybrid end-to-end: fused rank 1 is the query doc itself") {
    // both arms include the self-hit by contract, so identity must win
    val got = graft.SparkEntry.queries("hybrid_rrf")(
      spark, "/root/testdata/sf0.001")
      .filter(col("rank") === 1)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, id, arms, _, _) =>
      assert(id == q, s"query $q fused rank 1 was $id")
      assert(arms == 2L, s"query $q self-hit seen by $arms arms")
    }
  }
}
