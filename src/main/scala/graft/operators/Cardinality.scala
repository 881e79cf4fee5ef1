package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count maintenance: per-slice HLL sketches that
  * fold into the union's sketch without rescanning history — the
  * cardinality analog of [[Layout.mergeZoneMaps]]. Why it matters at
  * 100 TB: "distinct users/tokens/documents per slice and overall" is
  * a daily pipeline health metric, and the exact form
  * (`countDistinct`) shuffles every distinct VALUE per group; the HLL
  * register array is constant-size (2^lgK bytes), mergeable by
  * register-max, and a new ingest batch contributes one tiny sketch
  * row — history is never rescanned, exactly like the zone-map store.
  *
  * Built on Spark's Apache DataSketches HLL aggregates
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
  * SPARK-16484 family). Two properties the registered queries gate
  * in-plan:
  *
  *   - MERGE IDENTITY: union-of-slice-sketches ≡ one-shot sketch of
  *     the union, register for register — HLL union with a common lgK
  *     takes the per-register MAX, and a value's register contribution
  *     depends only on its hash, not on which slice carried it. So the
  *     two ESTIMATES are equal exactly, not approximately (the same
  *     argument [[Layout.mergeZoneMaps]] makes with min/max/sum).
  *   - ACCURACY: the estimate tracks exact `countDistinct` within the
  *     standard-error envelope (~1.04/sqrt(2^lgK); the gate allows 3
  *     sigma — it exists to catch breakage, not to hard-assert a
  *     probabilistic tail, the heavy_hitters_gate convention).
  *
  * Sketch bytes are engine-specific, so these queries are rows-only
  * for the driver's oracle (the exact-distinct twins stay oracle-able
  * elsewhere); correctness rides the in-plan gates + CardinalitySpec.
  */
object Cardinality {

  /** One HLL sketch per (slice, group): the row an ingest batch appends
    * to the cardinality store. One map-side-combining aggregate — the
    * sketch partials merge inside the agg, so no distinct-value
    * explosion crosses the wire, only 2^lgK-byte registers.
    * Output: (slice, group, sketch, n_rows).
    */
  def sliceSketches(df: DataFrame, slice: Column, group: Column,
                    value: Column, lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4,21], got $lgK")
    df.select(slice.as("slice"), group.as("group"), value.as("__v"))
      .groupBy(col("slice"), col("group"))
      .agg(hll_sketch_agg(col("__v"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Fold per-slice sketches into the served per-group view: one
    * bucket-keyed aggregate over STORE rows (each constant-size),
    * never over data rows. Output: (group, sketch, n_distinct,
    * n_rows, n_slices).
    */
  def mergeSliceSketches(sketches: DataFrame): DataFrame =
    sketches
      .groupBy(col("group"))
      .agg(hll_union_agg(col("sketch")).as("sketch"),
        sum(col("n_rows")).as("n_rows"),
        count(lit(1)).as("n_slices"))
      .withColumn("n_distinct", hll_sketch_estimate(col("sketch")))
      .select(col("group"), col("sketch"), col("n_distinct"),
        col("n_rows"), col("n_slices"))

  /** One-shot per-group estimate — the full-rebuild twin the merge
    * identity is gated against. Output: (group, n_distinct).
    */
  def distinctEstimate(df: DataFrame, group: Column, value: Column,
                       lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4,21], got $lgK")
    df.select(group.as("group"), value.as("__v"))
      .groupBy(col("group"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("__v"), lit(lgK))).as("n_distinct"))
  }
}
