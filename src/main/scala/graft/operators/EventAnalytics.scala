package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic event-stream analytics over an append-only event log —
  * ordered-funnel completion, cohort retention, and gaps-and-islands
  * change history (SCD2). These are the product-analytics counterparts
  * of the sessionization family ([[Sessionize]]): the reference's event
  * pipelines stop at per-hour rollups (jhub_proc's agg stage); these
  * give the engine the standard user-journey queries a warehouse team
  * would expect next.
  *
  * Scale shapes (all three):
  *  - every shuffle is keyed by the USER id — the natural high-
  *    cardinality key, so no single reducer is hot unless one user id
  *    is (bot traffic; pre-filter or salt upstream);
  *  - [[funnelTimes]] chains per-step conditional-min aggregations;
  *    every stage groups and joins on the same user key, so EVERY
  *    exchange in the plan hashes on user_id (plan-audited in
  *    PlanAuditSpec — no secondary-key shuffle anywhere) and each MIN
  *    is map-side partial before it shuffles. Nothing materializes
  *    per-user event arrays, so a power user costs extra rows, never
  *    executor memory;
  *  - [[retentionCohorts]] is two hash aggregations (first-seen per
  *    user, then distinct users per cohort×offset cell) — the output is
  *    cohorts × horizon rows, tiny at any corpus size;
  *  - [[changeHistory]] uses per-user windows (lag + running change
  *    count) — partitioned by user, never a global window.
  */
object EventAnalytics {

  /** Earliest ordered completion of the funnel `steps` per user:
    * `t1 = min ts of steps(0)`, `t{i} = min ts of steps(i-1) strictly
    * after t{i-1}` — greedy-earliest, which is exact for existence: if
    * ANY ordered assignment of events completes the prefix, the
    * greedy-minimum one does (a smaller t{i} only widens the window for
    * t{i+1}). One row per user who reached step 1; `t2..tk` are null
    * from the first step not reached. `maxStepGapSeconds`, if set,
    * additionally requires `t{i} <= t{i-1} + gap` (each adjacent pair,
    * the product-analytics "conversion window") — note greedy-earliest
    * is then a documented approximation at the margin: a later t{i-1}
    * choice could open a gap-window a smaller one misses; the industry
    * convention (and the registered oracle) pins the greedy reading.
    */
  def funnelTimes(events: DataFrame, user: Column, ts: Column,
                  eventType: Column, steps: Seq[String],
                  maxStepGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"duplicate funnel steps: $steps")
    maxStepGapSeconds.foreach(g =>
      require(g > 0, s"maxStepGapSeconds must be positive, got $g"))
    val typed = events.select(user.as("user_id"), ts.as("ts"),
      eventType.as("event_type"))
    var acc = typed.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    for (i <- 2 to steps.size) {
      val prev = s"t${i - 1}"
      val gapOk = maxStepGapSeconds match {
        case Some(g) =>
          col("e.ts") <= col(s"a.$prev") + expr(s"INTERVAL $g SECOND")
        case None => lit(true)
      }
      // acc is one row per user, so the step-i minimum joins back on the
      // user key alone; every stage aggregates and joins on user_id, so
      // the hash partitioning established by step 1 is reused end to end
      val stepMin = typed.filter(col("event_type") === steps(i - 1)).as("e")
        .join(acc.as("a"), col("e.user_id") === col("a.user_id") &&
          col("e.ts") > col(s"a.$prev") && gapOk)
        .groupBy(col("a.user_id").as("user_id"))
        .agg(min(col("e.ts")).as(s"t$i"))
      acc = acc.join(stepMin, Seq("user_id"),
        "left_outer" /* keep partial completions, null t_i onward */)
    }
    acc
  }

  /** Per-step funnel reach: `(step_idx, step, n_users)` — users whose
    * greedy-earliest completion got at least that far. Monotone
    * non-increasing in step_idx by construction.
    */
  def funnelReach(events: DataFrame, user: Column, ts: Column,
                  eventType: Column, steps: Seq[String],
                  maxStepGapSeconds: Option[Long] = None): DataFrame = {
    val times = funnelTimes(events, user, ts, eventType, steps,
      maxStepGapSeconds)
    // one pass: count(t_i) counts the non-null step times, so a single
    // aggregate over the times frame gives every step's reach — a
    // per-step filter+agg union would re-evaluate the whole funnel
    // chain (k-1 joins, k aggregations) once PER STEP
    val counts = times.agg(
      count(col("t1")).as("c1"),
      steps.indices.drop(1).map(i =>
        count(col(s"t${i + 1}")).as(s"c${i + 1}")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("step_idx"), lit(s).as("step"),
          col(s"c${i + 1}").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_users"))
  }

  /** Cohort retention: cohort = the user's first-seen period
    * (`date_trunc(granularity)` of their min ts); a user is retained at
    * offset n if they have ANY event in cohort + n periods. Returns
    * `(cohort, offset_n, n_active)` for offsets 0..horizon. `DATEDIFF`
    * semantics via integer period arithmetic on truncated dates — exact,
    * no timezone drift (the session zone is pinned UTC by every entry
    * point).
    */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column,
                       granularity: String = "day",
                       horizon: Int = 7): DataFrame = {
    require(Set("day", "week", "month")(granularity),
      s"granularity must be day|week|month, got $granularity")
    require(horizon >= 0, s"horizon must be >= 0, got $horizon")
    val typed = events.select(user.as("user_id"), ts.as("ts"))
    val firstSeen = typed.groupBy(col("user_id"))
      .agg(date_trunc(granularity, min(col("ts"))).as("cohort"))
    val active = typed
      .select(col("user_id"), date_trunc(granularity, col("ts")).as("period"))
      .distinct()
    val offset = granularity match {
      case "day"   => datediff(col("period"), col("cohort"))
      case "week"  => (datediff(col("period"), col("cohort")) / 7).cast("int")
      case "month" => months_between(col("period"), col("cohort")).cast("int")
    }
    active.join(firstSeen, "user_id")
      .select(col("cohort"), offset.as("offset_n"))
      .filter(col("offset_n") <= horizon)
      .groupBy(col("cohort"), col("offset_n"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** SCD2-style change history by gaps-and-islands: collapse each
    * user's consecutive runs of an attribute value into one validity
    * interval `(user_id, value, valid_from, valid_to, n_events)`;
    * `valid_to` is the next run's start (half-open intervals, the SCD2
    * convention) and null for the current run. Ties at identical ts
    * break by the id column so island numbering is deterministic.
    */
  def changeHistory(events: DataFrame, user: Column, ts: Column,
                    id: Column, value: Column): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("id"))
    val runs = events
      .select(user.as("user_id"), ts.as("ts"), id.as("id"), value.as("v"))
      .withColumn("chg",
        when(lag(col("v"), 1).over(w).isNull ||
          lag(col("v"), 1).over(w) =!= col("v"), 1).otherwise(0))
      .withColumn("island", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val iw = Window.partitionBy(col("user_id")).orderBy(col("island"))
    runs.groupBy(col("user_id"), col("island"), col("v"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(iw))
      .select(col("user_id"), col("v").as("value"), col("valid_from"),
        col("valid_to"), col("n_events"))
  }

  /** Within-session co-occurrence of event kinds — the market-basket
    * view of the event stream ("users who viewed X in a session also
    * did Y"): gap-sessionize, reduce each session to its distinct
    * kind set, count sessions containing each ordered pair (a < b)
    * alongside each kind's own session support. The counts are the
    * exact inputs to lift/PMI — keep the scores downstream so this
    * stays integer-exact end to end.
    *
    * Scale shape: the sessionizer's one user-keyed exchange + window;
    * the distinct-kinds reduction keys on (user, session); the pair
    * join is an equi-join ON THE SESSION KEY, so its fan-out is
    * bounded by (kinds-per-session choose 2) — the kind VOCABULARY,
    * never the event count — and supports broadcast back onto the
    * (|kinds|²)-row result.
    */
  def sessionCooccurrence(events: DataFrame, user: Column, ts: Column,
                          kind: Column, gapSeconds: Long): DataFrame = {
    val present = Sessionize.assignSessions(events, user, ts, gapSeconds,
        carry = Seq("kind" -> kind))
      .select(col("user_id"), col("session_idx"), col("kind"))
      .distinct()
    val support = present.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_sessions"))
    val pairs = present.as("a")
      .join(present.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_idx") === col("b.session_idx") &&
          col("a.kind") < col("b.kind"))
      .groupBy(col("a.kind").as("kind_a"), col("b.kind").as("kind_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(support.select(col("kind").as("kind_a"),
        col("n_sessions").as("n_a"))), Seq("kind_a"))
      .join(broadcast(support.select(col("kind").as("kind_b"),
        col("n_sessions").as("n_b"))), Seq("kind_b"))
      .select(col("kind_a"), col("kind_b"), col("n_both"), col("n_a"),
        col("n_b"))
  }
}
