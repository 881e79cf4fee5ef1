package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot comparison: classify every id across two loads of a table as
  * added / removed / changed / unchanged — the primitive behind
  * incremental reprocessing decisions ("which documents does tonight's
  * run actually need to touch?") and ingest audits (an unexpected
  * `removed` spike means an upstream dump truncated).
  */
object Snapshot {

  /** Full-outer join on `id`, content compared null-safely. Pass a cheap
    * digest as `content` (e.g. `xxhash64(col("text"))`) when rows are
    * wide — the comparison then shuffles 8 bytes per row instead of the
    * document; the classification is identical as long as the digest
    * collides with probability you can ignore (~1e-7 at millions of
    * rows for 64-bit).
    *
    * Scale shape: ONE exchange per side (hash on id) into a single
    * sort-merge or hash full-outer join; the status column is a pure
    * projection over the join output. If both snapshots are written
    * bucketed by id ([[graft.sinks.ParquetSink.writeBucketed]]), the
    * join plans no exchange at all.
    *
    * Contract: `id` must be unique WITHIN each snapshot — duplicate
    * ids multiply through the full-outer join (m×n rows for one id),
    * as in any keyed reconciliation; dedup first
    * ([[Dedup.exactKeepMinId]]) if the load can produce repeats.
    *
    * Output: (id, status) with status in
    * added | removed | changed | unchanged.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           id: Column, content: Column): DataFrame = {
    val o = oldSnap.select(id.as("id"), content.as("__old_c"))
    val n = newSnap.select(id.as("id"), content.as("__new_c"))
    // the content columns are the presence markers, so rows whose
    // content is genuinely NULL need a separate flag — otherwise a
    // null-content row classifies as added/removed
    val oo = o.withColumn("__old_present", lit(1))
    val nn = n.withColumn("__new_present", lit(1))
    oo.join(nn, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__old_present").isNull, lit("added"))
          .when(col("__new_present").isNull, lit("removed"))
          .when(col("__old_c") <=> col("__new_c"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** [[diff]] rolled up to audit counts: one row per status. */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
                  id: Column, content: Column): DataFrame =
    diff(oldSnap, newSnap, id, content)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
