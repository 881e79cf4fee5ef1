package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private val dict = Seq(
    (1L, "red bolt"), (2L, "red bolts"), (3L, "old bolt"),
    (4L, "blue gear"), (5L, "blue gears"), (6L, "green widget"))
    .toDF("id", "name")

  private def pairs(maxDist: Int, maxDf: Long = 1000L): Set[(Long, Long, Int)] =
    FuzzyJoin.tokenBlockedEditJoin(dict, col("id"), col("name"),
        maxDist, maxDf)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("finds shared-token pairs within distance, verifies exactly") {
    assert(pairs(2) == Set((1L, 2L, 1), (1L, 3L, 2), (4L, 5L, 1)))
    // tighter bound drops the distance-2 pair
    assert(pairs(1) == Set((1L, 2L, 1), (4L, 5L, 1)))
  }

  test("precision is 1: every reported pair is within the bound") {
    val got = FuzzyJoin.tokenBlockedEditJoin(dict, col("id"), col("name"), 2)
      .collect()
    got.foreach { r =>
      val (a, b, d) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Int]("dist"))
      // reference Levenshtein
      val ref = {
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      assert(d == ref && d <= 2)
    }
  }

  test("hot tokens above the df cap stop blocking") {
    // 'bolt' appears 3 times (ids 1,2,3 via 'bolt'/'bolts' tokens:
    // exact token 'bolt' in ids 1 and 3 only) — cap at 1 kills it,
    // leaving only pairs blocked by surviving tokens
    val got = pairs(2, maxDf = 1L)
    // 'red' df=2, 'bolt' df=2, 'bolts' df=1, 'blue' df=2... cap 1
    // keeps only df-1 tokens, which block no pairs
    assert(got.isEmpty)
  }

  test("duplicate shared tokens yield one pair, not multiples") {
    val d2 = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamme"))
      .toDF("id", "name")
    val got = FuzzyJoin.tokenBlockedEditJoin(d2, col("id"), col("name"), 2)
      .collect()
    assert(got.length == 1 && got.head.getAs[Int]("dist") == 1)
  }

  test("all-pairs twin finds pairs blocking misses") {
    // both tokens edited: no shared token, blocked join misses it,
    // the exact twin does not
    val d2 = Seq((1L, "hot bolt"), (2L, "hat bolts")).toDF("id", "name")
    assert(FuzzyJoin.tokenBlockedEditJoin(d2, col("id"), col("name"), 2)
      .count() == 0)
    val ap = FuzzyJoin.allPairsEditJoin(d2, col("id"), col("name"), 2)
      .collect()
    assert(ap.length == 1 && ap.head.getAs[Int]("dist") == 2)
  }

  test("rejects degenerate parameters") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.tokenBlockedEditJoin(dict, col("id"), col("name"), -1)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.tokenBlockedEditJoin(dict, col("id"), col("name"), 1, 0L)
    }
  }
}
