package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the standard windowed
  * formulation: an event starts a new session when it is more than
  * `gapSeconds` after its predecessor; sessions are then
  * (user, running count of session starts). One shuffle (partition by
  * user), everything else is window functions inside codegen.
  */
object Sessionize {

  /** Per-event session assignment: adds session_idx (1-based per user). */
  def assignSessions(events: DataFrame, user: Column, ts: Column,
                     gapSeconds: Long,
                     carry: Seq[(String, Column)] = Nil): DataFrame = {
    val reserved = Set("user_id", "ts", "session_idx")
    require(carry.forall { case (n, _) => !reserved.contains(n) },
      s"carry column names collide with reserved output columns " +
        s"${reserved.mkString("/")}: " +
        carry.map(_._1).filter(reserved).mkString(","))
    // window rebuilt over the RENAMED columns — the caller's expressions
    // are no longer resolvable after the projection below
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val prev = lag(unix_micros(col("ts")), 1).over(w)
    val newSession = when(prev.isNull ||
      unix_micros(col("ts")) - prev > gapSeconds * 1000000L, 1).otherwise(0)
    events.select(user.as("user_id") +: ts.as("ts") +:
        carry.map { case (n, c) => c.as(n) }: _*)
      .withColumn("session_idx",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Aggregated sessions: (user_id, session_idx, session_start,
    * session_end, n_events). Exactly two shuffle-free window passes over
    * one user-partitioned exchange + one hash aggregation on the same key
    * (no second exchange: the aggregation key is a superset of the window
    * partitioning).
    */
  def sessions(events: DataFrame, user: Column, ts: Column,
               gapSeconds: Long): DataFrame =
    assignSessions(events, user, ts, gapSeconds)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
}
