package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  // 3 chunks x disjoint-ish keys; key 5 appears in chunks 0 and 2
  private def rows = Seq(
    (0L, 1L), (0L, 2L), (0L, 5L),
    (1L, 3L), (1L, 4L),
    (2L, 5L), (2L, 6L)
  ).toDF("chunk", "key")

  private val K = 3
  private val M = 1024

  private def index = BloomIndex.build(rows, col("chunk"), col("key"), K, M)

  test("bitmaps are sparse, non-negative, and word-bounded") {
    val idx = index.collect()
    assert(idx.nonEmpty)
    assert(idx.forall(_.getLong(2) > 0L), "63-bit words never go negative")
    assert(idx.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= M / 63),
      "word index within mBits/63")
    // at most k set bits contributed per key, <= 3 keys per chunk
    val byChunk = idx.groupBy(_.getLong(0)).view.mapValues(
      _.map(r => java.lang.Long.bitCount(r.getLong(2))).sum)
    assert(byChunk.values.forall(b => b >= 1 && b <= K * 3))
  }

  test("no false negatives: every containing chunk is a candidate") {
    val probes = Seq("1", "2", "3", "4", "5", "6").toDF("probe_key")
    val cand = BloomIndex.candidates(index, probes, col("probe_key"), K, M)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val truth = rows.select(col("key").cast("string"), col("chunk"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(truth.subsetOf(cand),
      s"missing: ${truth.diff(cand)}")
    // key 5 straddles two chunks and must surface both
    assert(cand.filter(_._1 == "5").map(_._2).intersect(Set(0L, 2L)) ==
      Set(0L, 2L))
  }

  test("absent keys prune hard at this saturation") {
    // 3 keys in 1024 bits: fpr ~ (9/1024)^3 — an absent probe should
    // survive nowhere
    val probes = Seq("nope-1", "nope-2", "nope-3").toDF("probe_key")
    val cand = BloomIndex.candidates(index, probes, col("probe_key"), K, M)
    assert(cand.count() == 0L)
  }

  test("a chunk's filter is exactly the OR of its per-key filters") {
    // union property: build(all keys) == bit_or over build(one key each)
    val whole = index.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perKey = rows.collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (chunk, key) =>
        BloomIndex.build(Seq((chunk, key)).toDF("chunk", "key"),
            col("chunk"), col("key"), K, M)
          .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ | _)).toMap
    assert(whole == perKey)
  }

  test("adding keys never clears bits (monotone growth)") {
    val grown = rows.union(Seq((0L, 99L), (1L, 98L)).toDF("chunk", "key"))
    val before = index.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val after = BloomIndex.build(grown, col("chunk"), col("key"), K, M)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    before.foreach { case (k, bits) =>
      assert((after(k) & bits) == bits, s"bits cleared at $k")
    }
  }

  test("merge over coalesced chunks equals a rebuild") {
    // merge chunks {0,1} -> 0, {2} -> 1 (DIV 2), compare to building
    // directly on the coalesced chunk column
    val merged = BloomIndex.merge(index, expr("CAST(chunk DIV 2 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rebuilt = BloomIndex.build(rows,
        expr("CAST(chunk DIV 2 AS BIGINT)"), col("key"), K, M)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == rebuilt)
  }

  test("candidates broadcasts the probe side, never exchanges the index") {
    val probes = Seq("1", "5").toDF("probe_key")
    val plan = BloomIndex.candidates(index, probes, col("probe_key"), K, M)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
