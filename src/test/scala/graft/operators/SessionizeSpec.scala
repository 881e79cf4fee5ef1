package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {

  private def events = {
    import graft.TestSpark.spark.implicits._
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 10:10:00")),
      (1L, Timestamp.valueOf("2024-01-01 12:00:00")), // > 1h gap: new session
      (2L, Timestamp.valueOf("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
  }

  test("gap-based sessions split on the gap and count events") {
    val out = Sessionize.sessions(events, col("user_id"), col("ts"), 3600)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSet
    assert(out == Set(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:10:00"), 2L),
      (1L, 2L, Timestamp.valueOf("2024-01-01 12:00:00"),
        Timestamp.valueOf("2024-01-01 12:00:00"), 1L),
      (2L, 1L, Timestamp.valueOf("2024-01-01 09:00:00"),
        Timestamp.valueOf("2024-01-01 09:00:00"), 1L)))
  }

  test("session aggregation adds no second exchange after the window") {
    val plan = Sessionize.sessions(events, col("user_id"), col("ts"), 3600)
      .queryExecution.executedPlan.toString
    // one exchange for the user partitioning; the groupBy on
    // (user_id, session_idx) reuses it
    assert(plan.split("Exchange").length - 1 <= 2, plan)
  }
}
