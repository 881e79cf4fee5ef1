package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EventAnalyticsSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  // user 1: full ordered funnel; user 2: signup before view (out of
  // order -> stops after view); user 3: view only; user 4: never views
  // (must not appear at all).
  private def events = Seq(
    (1L, t("10:00:00"), 1L, "view"),
    (2L, t("10:05:00"), 1L, "click"),
    (3L, t("10:10:00"), 1L, "purchase"),
    (4L, t("09:00:00"), 2L, "click"),
    (5L, t("09:30:00"), 2L, "view"),
    (6L, t("11:00:00"), 3L, "view"),
    (7L, t("11:00:00"), 4L, "purchase"))
    .toDF("event_id", "ts", "user_id", "event_type")

  test("funnelTimes: greedy-earliest ordered completion with nulls after the break") {
    val got = EventAnalytics.funnelTimes(events, col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3))))
    assert(got.toSeq == Seq(
      (1L, t("10:00:00"), Some(t("10:05:00")), Some(t("10:10:00"))),
      (2L, t("09:30:00"), None, None), // click happened BEFORE the view
      (3L, t("11:00:00"), None, None)))
  }

  test("funnelTimes: the adjacent-step conversion window prunes slow steps") {
    val got = EventAnalytics.funnelTimes(events, col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase"),
      maxStepGapSeconds = Some(240L)) // 4 min: view->click (5 min) now fails
      .filter(col("t2").isNotNull).count()
    assert(got == 0L)
  }

  test("funnelReach: monotone per-step user counts") {
    val got = EventAnalytics.funnelReach(events, col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "view", 3L), (2, "click", 1L),
      (3, "purchase", 1L)))
  }

  test("retentionCohorts: day-offset activity against first-seen cohort") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 23:00:00")), // same day, 1 cell
      (1L, Timestamp.valueOf("2024-01-03 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-02 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-09 10:00:00")), // high offset
      (3L, Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.retentionCohorts(ev, col("user_id"), col("ts"),
      granularity = "day", horizon = 7)
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("2024-01-01", 0, 2L), // users 1 and 3 on their cohort day
      ("2024-01-01", 2, 1L), // user 1 back on Jan 3
      ("2024-01-02", 0, 1L), // user 2 cohort day
      ("2024-01-02", 7, 1L))) // user 2 on Jan 9, exactly at horizon
  }

  test("retentionCohorts: week and month granularities bucket by period arithmetic") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")), // cohort Mon Jan 1
      (1L, Timestamp.valueOf("2024-01-10 10:00:00")), // next ISO week -> offset 1
      (2L, Timestamp.valueOf("2024-01-05 10:00:00")), // cohort month Jan
      (2L, Timestamp.valueOf("2024-03-20 10:00:00"))) // offset 2 months
      .toDF("user_id", "ts")
    val weekly = EventAnalytics.retentionCohorts(ev, col("user_id"),
      col("ts"), granularity = "week", horizon = 7)
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getLong(2)))
      .toSet
    // date_trunc('week') -> Monday; Jan 1 2024 IS a Monday. User 2's
    // March activity is week offset 11 — beyond horizon 7, filtered out.
    assert(weekly == Set(
      ("2024-01-01", 0, 2L), // both users' first events fall in that week
      ("2024-01-01", 1, 1L)), weekly.toString) // user 1 the following week
    val monthly = EventAnalytics.retentionCohorts(ev, col("user_id"),
      col("ts"), granularity = "month", horizon = 7)
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getLong(2)))
      .toSet
    assert(monthly == Set(
      ("2024-01-01", 0, 2L),
      ("2024-01-01", 2, 1L)), monthly.toString)
    intercept[IllegalArgumentException] {
      EventAnalytics.retentionCohorts(ev, col("user_id"), col("ts"),
        granularity = "hour")
    }
  }

  test("changeHistory: consecutive runs collapse, half-open intervals chain") {
    val got = EventAnalytics.changeHistory(events.filter(col("user_id") === 1L)
      .unionAll(Seq((8L, t("10:20:00"), 1L, "view"))
        .toDF("event_id", "ts", "user_id", "event_type")),
      col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .orderBy("valid_from")
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("view", t("10:00:00"), Some(t("10:05:00")), 1L),
      ("click", t("10:05:00"), Some(t("10:10:00")), 1L),
      ("purchase", t("10:10:00"), Some(t("10:20:00")), 1L),
      ("view", t("10:20:00"), None, 1L)))
    // intervals chain: each valid_to is the next valid_from
  }

  test("changeHistory: a run of equal values is ONE interval with its count") {
    val ev = Seq(
      (1L, t("10:00:00"), 9L, "a"), (2L, t("10:01:00"), 9L, "a"),
      (3L, t("10:02:00"), 9L, "b"), (4L, t("10:03:00"), 9L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.changeHistory(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"))
      .orderBy("valid_from")
      .collect().map(r => (r.getString(1), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 2L), ("b", 1L), ("a", 1L)))
  }

  test("funnel rejects empty and duplicate step lists") {
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelTimes(events, col("user_id"), col("ts"),
        col("event_type"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelTimes(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "view"))
    }
  }

  test("sessionCooccurrence counts pairs per session, not per event") {
    // user 1, one session: a a b c (duplicate 'a' must not double a-b);
    // user 1, second session (2h later): a b; user 2: b c
    val ev = Seq(
      (1L, t("10:00:00"), "a"), (1L, t("10:01:00"), "a"),
      (1L, t("10:02:00"), "b"), (1L, t("10:03:00"), "c"),
      (1L, t("13:00:00"), "a"), (1L, t("13:01:00"), "b"),
      (2L, t("10:00:00"), "b"), (2L, t("10:05:00"), "c")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.sessionCooccurrence(ev, col("user_id"),
        col("ts"), col("event_type"), gapSeconds = 3600)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a-b in sessions 1 and 2 of user 1; supports: a in 2 sessions,
    // b in 3, c in 2
    assert(out(("a", "b")) == (2L, 2L, 3L), out.toString)
    assert(out(("a", "c")) == (1L, 2L, 2L))
    assert(out(("b", "c")) == (2L, 3L, 2L))
    assert(!out.contains(("b", "a")), "pairs are ordered a < b")
  }
}
