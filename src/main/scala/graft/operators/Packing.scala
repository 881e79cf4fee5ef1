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
  * are the parallelism unit; a single giant group would serialize its
  * prefix sum, so `chunkSize > 0` switches to the two-level scan:
  * chunk the group by floor(order / chunkSize) (order-monotone, hence
  * chunks are contiguous runs of the stream), window WITHIN each
  * (group, chunk) in parallel, and broadcast the per-chunk exclusive
  * totals back as offsets. All sums are exact long arithmetic, so the
  * two paths produce byte-identical assignments; the per-chunk-totals
  * side is one row per chunk — broadcast-sized even for a trillion-row
  * group at chunkSize 10M.
  */
object Packing {

  /** Output: input columns + `n_tokens`, `pack_id`, `pack_offset`.
    * `tokens` must be a non-negative integral column (token count per
    * document); `order` must be unique within a group for the assignment
    * to be well-defined.
    *
    * `chunkSize = 0` (default) runs the single window per group;
    * `chunkSize > 0` runs the two-level scan above — use it when one
    * group dominates the corpus. Chunking requires an integral (or
    * integral-castable) `order`: chunk = order div chunkSize, exact long
    * arithmetic at all magnitudes. Under ANSI mode (Spark 4 default) a
    * non-numeric `order` THROWS at the cast — use the unchunked path
    * for such orders. NULL order values chunk to a Long.MinValue
    * sentinel (the lowest chunk), matching the unchunked window's
    * nulls-first ordering; NULL group values are preserved via a
    * null-safe chunk join — both paths emit byte-identical assignments
    * for them.
    */
  def packAssignments(df: DataFrame, group: Column, order: Column,
                      tokens: Column, budget: Long,
                      chunkSize: Long = 0L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val toks = tokens.cast("long")
    val cum: DataFrame =
      if (chunkSize <= 0L) {
        val w = Window.partitionBy(group).orderBy(order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // exclusive prefix sum: tokens of all earlier docs in the group
        df.withColumn("__pack_cum", sum(toks).over(w) - toks)
      } else {
        // Two-level scan. Truncating long `div` is exact at ALL
        // magnitudes (no 2^53 double ceiling — the same argument as
        // pack_id below) and monotone in `order`, so chunk c's rows all
        // precede chunk c+1's in the group stream — a per-chunk local
        // prefix plus the exclusive sum of earlier chunks' totals IS the
        // group prefix. (Identity of the two paths never depended on
        // WHERE chunk boundaries fall, only that chunks are
        // order-contiguous runs.) NULL orders get a Long.MinValue
        // sentinel chunk: lowest chunk, and the within-chunk window's
        // nulls-first order matches the unchunked path. chunkSize=1 with
        // order=Long.MinValue collides with the sentinel, which is
        // harmless — rows merely share a chunk.
        val base = df
          .withColumn("__pack_grp", group)
          .withColumn("__pack_ord", order.cast("long"))
          .withColumn("__pack_chunk",
            coalesce(expr(s"__pack_ord div ${chunkSize}L"),
              lit(Long.MinValue)))
          .drop("__pack_ord")
        val wLocal = Window
          .partitionBy(col("__pack_grp"), col("__pack_chunk"))
          .orderBy(order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val local = base.withColumn("__pack_local", sum(toks).over(wLocal) - toks)
        // one row per (group, chunk): the cumulative-offset window here
        // runs over chunk COUNTS, not row counts — trivially small
        val wOff = Window.partitionBy(col("__pack_grp"))
          .orderBy(col("__pack_chunk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = base
          .groupBy(col("__pack_grp"), col("__pack_chunk"))
          .agg(sum(toks).as("__pack_ctot"))
          .withColumn("__pack_off",
            sum(col("__pack_ctot")).over(wOff) - col("__pack_ctot"))
          .select(col("__pack_grp").as("__pack_grp_r"),
            col("__pack_chunk").as("__pack_chunk_r"), col("__pack_off"))
        // null-safe (<=>) join: a NULL group (fine in the unchunked
        // window) must still meet its chunk offset — plain equality
        // would silently DROP those rows here
        local.join(broadcast(offsets),
            col("__pack_grp") <=> col("__pack_grp_r") &&
            col("__pack_chunk") <=> col("__pack_chunk_r"))
          .withColumn("__pack_cum", col("__pack_off") + col("__pack_local"))
          .drop("__pack_grp", "__pack_chunk", "__pack_grp_r",
            "__pack_chunk_r", "__pack_local", "__pack_off")
      }
    cum
      .withColumn("n_tokens", toks)
      // exact long division: __pack_cum is a sum of non-negative token
      // counts, so truncating `div` equals floor division in every
      // engine (DuckDB `//`, Spark `div`) and stays exact at ALL
      // magnitudes — no 2^53 double-precision ceiling
      .withColumn("pack_id", expr(s"__pack_cum div ${budget}L"))
      .withColumn("pack_offset", pmod(col("__pack_cum"), lit(budget)))
      .drop("__pack_cum")
  }
}
