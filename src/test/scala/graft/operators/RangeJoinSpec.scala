package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.plans.PlanInspect

class RangeJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rangeJoin matches exactly [start, end) and crosses cell borders") {
    import graft.TestSpark.spark.implicits._
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // == start: in
      (2L, ts("2024-01-01 10:59:59")),  // inside, other side of a 30m cell
      (3L, ts("2024-01-01 11:00:00")),  // == end: out (exclusive)
      (4L, ts("2024-01-01 09:59:59")),  // before: out
      (5L, ts("2024-01-02 10:30:00"))   // far away: out
    ).toDF("pid", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (200L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00"))
    ).toDF("iid", "w_start", "w_end")
    // granule (30m) smaller than the interval: replication must cover
    // every overlapped cell or border points get lost
    val got = RangeJoin.rangeJoin(points, "ts", intervals,
        "w_start", "w_end", granuleSeconds = 1800)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L)))
  }

  test("rangeJoin fails loudly on an interval wider than the cell cap") {
    import graft.TestSpark.spark.implicits._
    val points = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("pid", "ts")
    val dirty = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("9999-12-31 00:00:00"))
    ).toDF("iid", "w_start", "w_end")
    val e = intercept[Exception] {
      RangeJoin.rangeJoin(points, "ts", dirty, "w_start", "w_end",
        granuleSeconds = 3600, maxCellsPerInterval = 1000).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxCellsPerInterval")), e.toString)
  }

  test("rangeJoin rejects inputs using the reserved cell column") {
    import graft.TestSpark.spark.implicits._
    val bad = Seq((1L, ts("2024-01-01 10:00:00"), 0L))
      .toDF("pid", "ts", "__range_cell")
    val ivs = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "w_start", "w_end")
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(bad, "ts", ivs, "w_start", "w_end", 3600)
    }
  }

  test("rangeJoin plans an equi-join, never a nested loop") {
    import graft.TestSpark.spark.implicits._
    val points = (0L until 100L).map(i =>
      (i, new Timestamp(1700000000000L + i * 60000L))).toDF("pid", "ts")
    val intervals = (0L until 10L).map(i =>
      (i, new Timestamp(1700000000000L + i * 600000L),
        new Timestamp(1700000000000L + i * 600000L + 3600000L)))
      .toDF("iid", "w_start", "w_end")
    val joined = RangeJoin.rangeJoin(points, "ts", intervals,
      "w_start", "w_end", granuleSeconds = 3600)
    assert(!PlanInspect.hasCartesian(joined), PlanInspect.planString(joined))
    // candidates are unique per (point, interval) — no dedup hidden anywhere
    val pairs = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.toSet.size)
  }

  test("rangeJoin saltBuckets: spreads a single hot cell, identical results") {
    import graft.TestSpark.spark.implicits._
    // the documented worst case: EVERY point in one hour cell
    val base = 1699999200L // hour-aligned epoch seconds
    val points = (0L until 1000L).map(i =>
      (i, new Timestamp((base + i % 1800) * 1000L))).toDF("pid", "ts")
    val intervals = Seq(
      (1L, new Timestamp(base * 1000L), new Timestamp((base + 3600) * 1000L)),
      (2L, new Timestamp(base * 1000L), new Timestamp((base + 1800) * 1000L))
    ).toDF("iid", "w_start", "w_end")
    def run(salt: Int) = RangeJoin.rangeJoin(points, "ts", intervals,
      "w_start", "w_end", granuleSeconds = 3600, saltBuckets = salt)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // multiplicity preserved exactly: each point joins one salted replica
    assert(key(run(8)) == key(run(1)))
    // balance at the join's own shuffle: AQE off so the output keeps the
    // join's partitioning; broadcast off so it IS a shuffle join
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    val prevBcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def sizes(df: org.apache.spark.sql.DataFrame): Seq[Int] =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect()
          .filter(_ > 0).toSeq
      val hot = sizes(run(1))
      val spread = sizes(run(8))
      assert(hot.length == 1, s"hot cell should land on ONE reducer: $hot")
      assert(spread.length >= 2, s"salting should spread the cell: $spread")
      assert(spread.max < hot.head, s"max salted partition ${spread.max} " +
        s"should be below the unsalted ${hot.head}")
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }

  test("rangeJoin broadcastRight: same rows, broadcast hash join, point side unshuffled") {
    import graft.TestSpark.spark.implicits._
    val points = (0L until 100L).map(i =>
      (i, new Timestamp(1700000000000L + i * 60000L))).toDF("pid", "ts")
    val intervals = (0L until 10L).map(i =>
      (i, new Timestamp(1700000000000L + i * 600000L),
        new Timestamp(1700000000000L + i * 600000L + 3600000L)))
      .toDF("iid", "w_start", "w_end")
    val shuffled = RangeJoin.rangeJoin(points, "ts", intervals,
      "w_start", "w_end", granuleSeconds = 3600)
    val bcast = RangeJoin.rangeJoin(points, "ts", intervals,
      "w_start", "w_end", granuleSeconds = 3600, broadcastRight = true)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(key(bcast) == key(shuffled))
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("ShuffleExchange"), plan)
  }
}
