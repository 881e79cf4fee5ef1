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

  /** Incremental view maintenance for a ROW-LOCAL derived table: bring
    * `prevDerived` = `derive(oldSnap)` up to date with `newSnap` by
    * recomputing ONLY the rows the snapshot diff says changed —
    * surviving rows pass through untouched, `derive` runs over the
    * added/changed slice alone, removed ids drop out. This is the
    * nightly-refresh shape for every per-document annotation table
    * (quality scores, token counts, fingerprints, embeddings): at
    * 100 TB with sub-percent daily churn, a full re-derivation
    * re-tokenizes the whole corpus to change almost nothing, while
    * this touches churn-sized data plus one id-keyed reconciliation.
    *
    * Contract:
    *   - `derive` must be ROW-LOCAL: `derive(subset)` must equal the
    *     restriction of `derive(whole)` to that subset (pure per-row
    *     projections/kernels — no corpus aggregates, no joins back
    *     into the snapshot). A corpus-dependent derive (df/idf stats,
    *     normalization by a global mean) silently violates the
    *     full-recompute equivalence; refresh those via their mergeable
    *     partial-aggregate forms instead ([[graft.operators.Layout.mergeZoneMaps]]
    *     / the sketch stores are that family's primitives).
    *   - `prevDerived` is exactly `derive(oldSnap)` (same id universe);
    *     `idName` names the id column in all four frames; ids unique
    *     per snapshot (the [[diff]] contract).
    *   - Equality of `content` must imply equality of `derive`'s
    *     inputs for that row — compare the columns `derive` reads (or
    *     a digest of them), not an unrelated version stamp.
    *
    * Scale shape: the [[diff]] full-outer join plus two LEFT SEMI
    * joins, every one keyed on the SAME id — bucketed-by-id stores
    * plan the whole refresh with zero exchange, and AQE reuses the
    * diff's exchange for the semi probes otherwise. `derive` sees only
    * churn-sized input. The output union is a pure concatenation (no
    * shuffle); `unionByName` fails loudly if a derive schema drifted
    * from the stored table.
    */
  def incrementalRefresh(prevDerived: DataFrame,
                         oldSnap: DataFrame, newSnap: DataFrame,
                         idName: String, content: Column,
                         derive: DataFrame => DataFrame): DataFrame = {
    val d = diff(oldSnap, newSnap, col(idName), content)
    val kept = prevDerived.join(
      d.filter(col("status") === "unchanged").select(col("id").as("__keep_id")),
      prevDerived(idName) === col("__keep_id"), "left_semi")
    val freshRows = newSnap.join(
      d.filter(col("status").isin("added", "changed"))
        .select(col("id").as("__fresh_id")),
      newSnap(idName) === col("__fresh_id"), "left_semi")
    kept.unionByName(derive(freshRows))
  }

  /** The AGGREGATE half of incremental view maintenance: bring a
    * stored per-group (count, sum) table up to date with `newSnap` by
    * pure delta ALGEBRA — added/changed rows contribute positively,
    * removed/changed rows' OLD values contribute negatively, the
    * stored aggregates merge with one group-keyed sum, and groups
    * whose count reaches zero disappear (exactly as a full recompute
    * would have no row). History is never rescanned: the delta aggs
    * touch churn-sized row sets, the merge touches group-sized frames.
    * This is the sum/count instance of the self-maintainable-view
    * algebra (every commutative-group aggregate maintains this way;
    * min/max do NOT — a removed minimum needs a rescan — which is why
    * the zone-map family keeps append-only merge semantics instead).
    *
    * Contract mirrors [[incrementalRefresh]]: `prevAgg` is exactly the
    * (groupName, n_rows, sum_value) aggregate of `oldSnap`; equality of
    * `content` must imply equality of (group, value) for that row —
    * and note a CHANGED row may move BETWEEN groups, which the
    * subtract-old/add-new algebra handles by construction. Exact for
    * integral `value` columns (integer addition commutes); float sums
    * would re-order — keep those to the tolerance-gated sketch family.
    *
    * Output: (groupName, n_rows, sum_value).
    */
  def incrementalRefreshAgg(prevAgg: DataFrame,
                            oldSnap: DataFrame, newSnap: DataFrame,
                            idName: String, content: Column,
                            groupName: String, value: Column): DataFrame = {
    val d = diff(oldSnap, newSnap, col(idName), content)
    def side(snap: DataFrame, statuses: Seq[String], sign: Long) =
      snap.join(
          d.filter(col("status").isin(statuses: _*))
            .select(col("id").as("__delta_id")),
          snap(idName) === col("__delta_id"), "left_semi")
        .select(col(groupName), lit(sign).as("__sgn"),
          value.cast("long").as("__v"))
    val deltas = side(newSnap, Seq("added", "changed"), 1L)
      .unionByName(side(oldSnap, Seq("removed", "changed"), -1L))
      .groupBy(col(groupName))
      .agg(sum(col("__sgn")).as("n_rows"),
        sum(col("__sgn") * col("__v")).as("sum_value"))
    prevAgg.select(col(groupName), col("n_rows"), col("sum_value"))
      .unionByName(deltas)
      .groupBy(col(groupName))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_value")).as("sum_value"))
      .where(col("n_rows") > 0)
  }
}
