package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign every document its
  * position in the concatenated token stream of its group — the
  * "concat-and-chunk" batching scheme, where the stream is cut into
  * fixed `budget`-token context windows and a document's tokens land at
  * a deterministic (pack, offset).
  *
  * This computes WHERE each document starts: `pack_id` = the window its
  * first token falls in, `pack_offset` = the position inside that
  * window. A document may straddle a window boundary — that is the
  * defining property of concat-and-chunk (no padding, full window
  * utilization); writers that must not split documents can gate on
  * `pack_offset + n_tokens <= budget` and re-pack the remainder.
  *
  * Deterministic: a pure function of (group, order, token counts), so
  * re-runs, engine changes, and cluster resizes reproduce identical
  * assignments — the same property the md5 split/sampling operators
  * guarantee.
  *
  * Scale: one exchange (hash on `group`) + an in-partition sort for the
  * running sum — the same shape as any per-key cumulative window. Groups
  * are the parallelism unit; a single giant group serializes its prefix
  * sum (the standard two-level refinement: chunk the group, window
  * within chunks, broadcast per-chunk totals as offsets).
  */
object Packing {

  /** Output: input columns + `n_tokens`, `pack_id`, `pack_offset`.
    * `tokens` must be a non-negative integral column (token count per
    * document); `order` must be unique within a group for the assignment
    * to be well-defined.
    */
  def packAssignments(df: DataFrame, group: Column, order: Column,
                      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive prefix sum: tokens of all earlier docs in the group
    val cum = (sum(tokens.cast("long")).over(w) - tokens.cast("long"))
      .as("__pack_cum")
    df.withColumn("__pack_cum", cum)
      .withColumn("n_tokens", tokens.cast("long"))
      // floor(double) division: exact below 2^53 tokens per group and
      // byte-identical across engines (integer division truncation rules
      // differ for signed types; these are non-negative but explicit
      // floor keeps the semantics self-evident)
      .withColumn("pack_id",
        floor(col("__pack_cum").cast("double") / lit(budget.toDouble)))
      .withColumn("pack_offset", pmod(col("__pack_cum"), lit(budget)))
      .drop("__pack_cum")
  }
}
