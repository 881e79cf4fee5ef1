package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {

  test("asof join picks the latest right row at or before the left ts") {
    import graft.TestSpark.spark.implicits._
    val quotes = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100.0),
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), 110.0),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 200.0)
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:30:00"), "t1"),
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), "t2"), // same instant: visible
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), "t3"), // before any quote
      (3L, Timestamp.valueOf("2024-01-01 12:00:00"), "t4")  // key never quoted
    ).toDF("k", "tts", "trade")

    val out = AsofJoin.asofJoin(trades, col("k"), col("tts"),
      quotes, col("k"), col("qts"), Seq("price" -> col("price")))
      .collect().map(r => (r.getAs[String]("trade"),
        Option(r.get(r.fieldIndex("price"))))).toMap
    assert(out("t1").contains(100.0))
    assert(out("t2").contains(110.0)) // right row at equal ts counts
    assert(out("t3").isEmpty)         // no quote yet
    assert(out("t4").isEmpty)         // unknown key
  }

  test("asof join shuffles once (union plan, no join operator)") {
    import graft.TestSpark.spark.implicits._
    val l = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), "x")).toDF("k", "ts", "v")
    val r = Seq((1L, Timestamp.valueOf("2024-01-01 09:00:00"), 5.0)).toDF("k", "ts", "p")
    val plan = AsofJoin.asofJoin(l, col("k"), col("ts"), r, col("k"), col("ts"),
      Seq("p" -> col("p"))).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }
}
