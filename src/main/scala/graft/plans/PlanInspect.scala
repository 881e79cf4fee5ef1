package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan introspection helpers backing the plan-audit tests and
  * ad-hoc `wouldScale` checks — the executable form of the SCALE.md
  * properties (filters pushed, schemas pruned, no accidental cartesian,
  * bounded exchanges).
  */
object PlanInspect {

  def executedPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  def planString(df: DataFrame): String = executedPlan(df).toString

  /** Number of SHUFFLE exchanges in the plan (word-boundary match, so
    * BroadcastExchange / ReusedExchange are not miscounted).
    */
  def exchangeCount(df: DataFrame): Int =
    "\\bExchange\\b".r.findAllIn(planString(df)).length

  def hasBroadcastJoin(df: DataFrame): Boolean =
    planString(df).contains("BroadcastHashJoin")

  def hasCartesian(df: DataFrame): Boolean = {
    val p = planString(df)
    p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
  }

  /** Pushed parquet filters as rendered in the scan node ("[]" if none). */
  def pushedFilters(df: DataFrame): Seq[String] =
    "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(planString(df))
      .map(_.group(1)).toSeq

  /** Partition filters at the file scans (partition pruning evidence —
    * a filter on the partition column must land HERE, not in a post-scan
    * Filter node, or every partition directory is still listed and read).
    */
  def partitionFilters(df: DataFrame): Seq[String] =
    "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(planString(df))
      .map(_.group(1)).toSeq

  /** Read schemas of the file scans (column pruning evidence). */
  def readSchemas(df: DataFrame): Seq[String] =
    "ReadSchema: (struct<[^>]*>)".r.findAllMatchIn(planString(df))
      .map(_.group(1)).toSeq

  /** One-line scale summary for a quick eyeball in the REPL. */
  def summary(df: DataFrame): String = {
    val p = planString(df)
    s"exchanges=${exchangeCount(df)} broadcastJoins=${hasBroadcastJoin(df)} " +
      s"cartesian=${hasCartesian(df)} codegenStages=${
        "\\*\\(\\d+\\)".r.findAllIn(p).toSet.size}"
  }
}
