package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the `DESCRIBE`-on-steroids every data
  * platform runs when a new staging table lands (the reference's
  * schema-on-read ingestion means nobody knows a table's shape until
  * someone looks: which columns are null-riddled, which are candidate
  * keys, what the value ranges are — exactly what this answers before
  * anyone writes a query). Complements [[Constraints]]: the auditor
  * CHECKS rules you already know; the profiler DISCOVERS the facts the
  * rules should encode.
  *
  * Output is long-format, one row per profiled column:
  * `(column_name, data_type, n_rows, n_nonnull, n_distinct, min_value,
  * max_value, avg_len, is_candidate_key)`. `data_type` is the
  * column's Spark type (a driver literal from the schema — downstream
  * rule derivation needs it: a string column whose values RENDER as
  * integers must not found a numeric range rule). min/max are
  * computed on the column's
  * NATIVE type (so numerics order numerically) and rendered to string
  * only at the end; `avg_len` is the mean rendered length over
  * non-null rows; `is_candidate_key` is the discovery form of
  * [[Constraints.Unique]] — true iff the column is null-free AND
  * all-distinct. The key claim is an EQUALITY on the distinct count,
  * which an HLL++ estimate cannot support (a real key would almost
  * always read false, a lucky estimate could read true), so with
  * `exactDistinct = false` the column is NULL — unknown, not a
  * verdict; and an empty frame keys NOTHING (0 == 0 proves no
  * uniqueness), so the claim is also gated on `n_rows > 0`.
  *
  * Scale shape: ONE aggregation over the frame, map-side combining,
  * no joins. The only scale knob is distinct counting:
  * `exactDistinct = true` uses `count(distinct col)` per column, which
  * Catalyst plans through a single scan + Expand (rows × #columns
  * before the partial agg — fine at audit scale, and it is what the
  * DuckDB oracle can replay bit-for-bit); at 100 TB profile with
  * `exactDistinct = false`, which swaps in `approx_count_distinct`
  * (HLL++) — no Expand, constant-size partials, same single scan.
  * Min/max/count partials are a few bytes per column either way.
  */
object Profile {

  /** Profile `columns` of `df` in one aggregation pass. */
  def table(df: DataFrame, columns: Seq[String],
            exactDistinct: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = Seq.newBuilder[Column]
    aggs += count(lit(1)).as("__n")
    columns.zipWithIndex.foreach { case (c, i) =>
      val nat = col(c)
      aggs += count(nat).as(s"__nn$i")
      aggs += (if (exactDistinct) count_distinct(nat)
               else approx_count_distinct(nat)).as(s"__nd$i")
      aggs += min(nat).cast("string").as(s"__mn$i")
      aggs += max(nat).cast("string").as(s"__mx$i")
      // exact integer sum + ONE IEEE division (not avg(): explicit
      // sum/count keeps the arithmetic engine-portable bit-for-bit)
      aggs += (sum(length(nat.cast("string"))).cast("double") /
        count(nat)).as(s"__al$i")
    }
    val built = aggs.result()
    val one = df.agg(built.head, built.tail: _*)
    // resolved (case-insensitively) against the frame, not the raw
    // name: the type is a driver literal, no extra scan
    val resolvedTypes = df.select(columns.map(col): _*).schema
      .fields.map(_.dataType.simpleString)
    one.select(explode(array(columns.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        lit(resolvedTypes(i)).as("data_type"),
        col("__n").as("n_rows"),
        col(s"__nn$i").as("n_nonnull"),
        col(s"__nd$i").as("n_distinct"),
        col(s"__mn$i").as("min_value"),
        col(s"__mx$i").as("max_value"),
        col(s"__al$i").as("avg_len"),
        (if (exactDistinct)
           (col("__n") > 0 && col(s"__nn$i") === col("__n") &&
             col(s"__nd$i") === col("__n"))
         else lit(null).cast("boolean")).as("is_candidate_key"))
    }: _*)).as("r")).select(col("r.*"))
  }

  /** Schema + distribution drift between two loads of "the same"
    * table — the check a schema-on-read ingestion (the reference's
    * model: whatever fields today's JSON happens to carry) runs
    * before promoting a load: which columns appeared/vanished, which
    * changed type, and how the null/distinct mass moved on the common
    * ones. One [[table]] pass per side, full-outer joined on the
    * column name; types come from the schemas (driver literals, no
    * extra scan).
    *
    * Output one row per column in either side: `(column_name, status
    * ∈ added|removed|common, old_type, new_type, type_changed,
    * old_nonnull, new_nonnull, old_distinct, new_distinct)` — counts
    * null on the absent side, `type_changed` null unless common.
    */
  def drift(oldDf: DataFrame, newDf: DataFrame,
            oldColumns: Seq[String], newColumns: Seq[String]): DataFrame = {
    require(oldColumns.nonEmpty && newColumns.nonEmpty,
      "need columns on both sides")
    // types come straight off the profile's own data_type column (a
    // driver literal [[table]] already resolves per column)
    def side(df: DataFrame, cols: Seq[String], tag: String): DataFrame =
      table(df, cols).select(col("column_name"),
        col("data_type").as(s"${tag}_type"),
        col("n_nonnull").as(s"${tag}_nonnull"),
        col("n_distinct").as(s"${tag}_distinct"))
    side(oldDf, oldColumns, "old")
      .join(side(newDf, newColumns, "new"), Seq("column_name"), "full_outer")
      .select(col("column_name"),
        when(col("old_type").isNull, lit("added"))
          .when(col("new_type").isNull, lit("removed"))
          .otherwise(lit("common")).as("status"),
        col("old_type"), col("new_type"),
        when(col("old_type").isNotNull && col("new_type").isNotNull,
          col("old_type") =!= col("new_type")).as("type_changed"),
        col("old_nonnull"), col("new_nonnull"),
        col("old_distinct"), col("new_distinct"))
  }

  /** Equi-DEPTH histogram of a numeric column: `k` buckets holding
    * ~equal row counts, cut at the exact interpolated percentiles —
    * the distribution view `table`'s min/max can't give (an equi-WIDTH
    * histogram of a skewed column puts everything in one bar; cutting
    * by rank shows the shape). Bucket membership is
    * `Σ_j [value > q_j]` over the k−1 interior quantiles — the same
    * comparison chain an engine-portable oracle can replay, with ties
    * landing in the lower bucket by the strict `>`.
    *
    * Keep `k` a power of two when the column is integral and the
    * oracle must hash-match: interior fractions i/k are then exact
    * binaries, so the standard `lo + frac·(hi−lo)` interpolation is
    * exact arithmetic in ANY engine. Output one row per OCCUPIED
    * bucket: `(bucket, lo_bound, hi_bound, n)` where the bounds are
    * the enclosing quantiles (global min/max at the edges).
    *
    * Scale shape: two aggregation passes over the single projected
    * column — one exact-percentile rollup (driver-sized result,
    * broadcast back), one count keyed on the derived bucket id (k
    * groups). The exact percentile buffers the column per partition;
    * at 100 TB swap `approx_percentile` in for the boundary pass —
    * the bucket-count pass is unchanged.
    */
  def equiDepthHistogram(df: DataFrame, column: String, k: Int,
                         exactBoundaries: Boolean = true): DataFrame = {
    require(k >= 2, "need at least 2 buckets")
    val c = col(column)
    val fracs = (1 until k).map(_.toDouble / k)
    val qs =
      if (exactBoundaries)
        percentile(c, array(fracs.map(lit): _*)).as("qs")
      else
        approx_percentile(c, array(fracs.map(lit): _*), lit(10000)).as("qs")
    val bounds = df.agg(qs, min(c).cast("double").as("mn"),
      max(c).cast("double").as("mx"))
    val bucket = (1 until k).map(i =>
      when(c > element_at(col("qs"), i), 1).otherwise(0))
      .reduce(_ + _).as("bucket")
    df.where(c.isNotNull).crossJoin(broadcast(bounds))
      .select(bucket, col("qs"), col("mn"), col("mx"))
      .groupBy("bucket")
      .agg(first(col("qs")).as("qs"), first(col("mn")).as("mn"),
        first(col("mx")).as("mx"), count(lit(1)).as("n"))
      .select(col("bucket"),
        when(col("bucket") === 0, col("mn"))
          .otherwise(expr("element_at(qs, CAST(bucket AS INT))"))
          .as("lo_bound"),
        when(col("bucket") === k - 1, col("mx"))
          .otherwise(expr("element_at(qs, CAST(bucket + 1 AS INT))"))
          .as("hi_bound"),
        col("n"))
  }

  /** Population-stability counts — the DISTRIBUTION half of drift
    * ([[drift]] sees schema and null/distinct mass; this sees the
    * shape): freeze the equi-depth boundaries on the REFERENCE
    * snapshot, bucket both snapshots with the same comparison chain,
    * and report per-bucket counts side by side. A stable column puts
    * ~1/k of the new load in every reference bucket; mass piling into
    * one bucket is the classic PSI alarm. Counts stay exact integers
    * (the PSI score itself needs `ln` — compute it downstream from
    * these counts so the portable part stays hash-checkable).
    *
    * Scale shape: one percentile rollup on the reference + one
    * counting pass per side against the broadcast boundaries.
    */
  def stabilityCounts(refDf: DataFrame, newDf: DataFrame, column: String,
                      k: Int): DataFrame = {
    require(k >= 2, "need at least 2 buckets")
    val c = col(column)
    val fracs = (1 until k).map(_.toDouble / k)
    val bounds = refDf.agg(
      percentile(c, array(fracs.map(lit): _*)).as("qs"))
    def counts(df: DataFrame, tag: String): DataFrame = {
      val bucket = (1 until k).map(i =>
        when(c > element_at(col("qs"), i), 1).otherwise(0))
        .reduce(_ + _).as("bucket")
      df.where(c.isNotNull).crossJoin(broadcast(bounds))
        .select(bucket)
        .groupBy("bucket").agg(count(lit(1)).as(s"${tag}_n"))
    }
    counts(refDf, "ref").join(counts(newDf, "new"), Seq("bucket"),
        "full_outer")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"))
  }

  /** Functional-dependency check: for each candidate `a → b`, does
    * every value of `a` determine exactly one value of `b`? The
    * profiling question behind normalization, key inference and
    * "can I safely join on this" — [[table]] discovers single-column
    * keys; this discovers the cross-column structure. A violating
    * group is an `a` value observed with >1 distinct `b` (nulls in
    * `b` don't count as a value, matching `count(distinct)`); the
    * dependency holds iff no group violates.
    *
    * Scale shape: one two-column projected scan + hash agg per
    * candidate (grouped on `a`, distinct-counting `b`), then a
    * single-row rollup — candidates are checked independently, so k
    * candidates cost k thin scans and the output is k rows.
    */
  def functionalDependencies(df: DataFrame,
                             deps: Seq[(String, String)]): DataFrame = {
    require(deps.nonEmpty, "need at least one candidate dependency")
    deps.map { case (a, b) =>
      df.groupBy(col(a))
        .agg(count_distinct(col(b)).as("__k"))
        .agg(count(lit(1)).as("n_groups"),
          coalesce(sum(when(col("__k") > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_violating_groups"))
        .select(lit(s"$a->$b").as("dependency"), col("n_groups"),
          col("n_violating_groups"),
          (col("n_violating_groups") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Per-column most-frequent values — the "what's actually IN this
    * column" half of profiling. One projected scan + hash agg per
    * column (each scan prunes to that single column at the reader, so
    * k columns cost k thin scans, not k table scans); ties break by
    * value ascending so the result is deterministic. The top-k itself
    * is `orderBy.limit(k)`, which Catalyst plans as
    * TakeOrderedAndProject — per-partition partial top-k merged at the
    * driver, NEVER a global sort, so a billion-distinct key column
    * ships k rows per partition, not the distinct set. Returns
    * `(column_name, value, n, rnk)` with `rnk <= k`.
    */
  def topValues(df: DataFrame, columns: Seq[String], k: Int): DataFrame = {
    require(columns.nonEmpty && k > 0, "need columns and k > 0")
    import org.apache.spark.sql.expressions.Window
    columns.map { c =>
      val top = df.where(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("value").asc)
        .limit(k)
      // rank over the k survivors only — a k-row window, not a sort
      val w = Window.orderBy(col("n").desc, col("value").asc)
      top.withColumn("rnk", row_number().over(w))
        .select(lit(c).as("column_name"), col("value"), col("n"),
          col("rnk"))
    }.reduce(_ unionByName _)
  }
}
