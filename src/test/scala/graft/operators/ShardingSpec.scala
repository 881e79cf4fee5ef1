package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ShardingSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  test("boundaries: equal contiguous slices of the 4-hex key space") {
    assert(Sharding.boundaries(1) == Seq.empty)
    assert(Sharding.boundaries(2) == Seq("8000"))
    assert(Sharding.boundaries(4) == Seq("4000", "8000", "c000"))
    assert(Sharding.boundaries(16) ==
      (1 until 16).map(i => f"${i * 4096}%04x"))
    // non-power-of-two: floor(i*65536/3)
    assert(Sharding.boundaries(3) == Seq("5555", "aaaa"))
  }

  test("assignShards: shard is the key's slice index, stable and total") {
    val docs = (0L until 200L).toDF("doc_id")
    val got = Sharding.assignShards(docs, col("doc_id"), numShards = 4)
      .select("doc_id", "shard_key", "shard")
      .as[(Long, String, Int)].collect()
    assert(got.length == 200)
    val bounds = Sharding.boundaries(4)
    got.foreach { case (_, key, shard) =>
      val expect = bounds.count(b => key >= b)
      assert(shard == expect, s"key $key -> shard $shard, want $expect")
      assert(shard >= 0 && shard < 4)
    }
    // every shard populated at n=200 (P(miss) ~ (3/4)^200, negligible)
    assert(got.map(_._3).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    // determinism: a re-run assigns identically
    val again = Sharding.assignShards(docs, col("doc_id"), numShards = 4)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    got.foreach { case (id, _, shard) => assert(again(id) == shard) }
  }

  test("shardStats: per-shard counts and token mass reconcile with input") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f"), (4L, "g h i j"))
      .toDF("doc_id", "text")
    val sharded = Sharding.assignShards(docs, col("doc_id"), numShards = 2)
    val stats = Sharding.shardStats(sharded,
        graft.functions.TextFunctions.tokenCount(col("text")))
      .as[(Int, Long, Long, String, String)].collect()
    assert(stats.map(_._2).sum == 4L)    // all docs accounted for
    assert(stats.map(_._3).sum == 10L)   // 3+2+1+4 tokens
    stats.foreach { case (shard, _, _, minK, maxK) =>
      assert(minK <= maxK)
      if (shard == 0) assert(maxK < "8000") else assert(minK >= "8000")
    }
  }

  test("numShards bounds are enforced") {
    intercept[IllegalArgumentException](Sharding.boundaries(0))
    intercept[IllegalArgumentException](Sharding.boundaries(65537))
  }
}
