package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) interleaving + fixed
  * -width zone maps + candidate-bucket pruning stats — the file-layout
  * optimization behind "OPTIMIZE ... ZORDER BY" in lakehouse engines
  * (Delta/Iceberg publish the technique; the curve itself is Morton
  * 1966). Why it matters at 100 TB: parquet scans skip row groups via
  * min/max stats, but a table sorted by ONE key has useless stats for
  * every OTHER predicate column; interleaving the bits of two (or more)
  * columns gives every z-contiguous file a small bounding BOX in value
  * space, so a 2-D selective predicate prunes on both dimensions at
  * once. The operators here are the measurable core: compute the
  * curve, lay the data out, derive the zone map a scan planner would
  * use, and quantify how many buckets a box query actually touches
  * under z-layout vs a single-key layout.
  *
  * Everything is exact integer bit arithmetic (shifts/and/or on
  * longs), so every stage is whole-stage-codegen'd, shuffle-free until
  * the one zone-map aggregation, and bit-identically reproducible in
  * DuckDB for the oracle.
  */
object Layout {

  /** Bit-spread the low 16 bits of `c` to even bit positions 0,2,..30
    * (the classic mask doubling: 8-4-2-1). Input outside [0, 65535]
    * must be masked by the caller — [[zValue]] does.
    */
  private def spread16(c: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))
      .foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
        case (v, (s, m)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
      }

  /** 32-bit Morton z-value of two dimensions, each masked to its low 16
    * bits: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Pure projection — no shuffle, codegen'd, ~10 long ops per row.
    * Callers with domains that don't already fill 16 bits normalize
    * first ([[normalize16]]) — interleaving works on RELATIVE position
    * within each domain, so a narrow column left unscaled contributes
    * nothing but zero bits to the curve's coarse levels.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** 32-bit Hilbert curve index of two 16-bit dimensions — the
    * locality-better alternative to [[zValue]] (Hilbert 1891; Faloutsos
    * & Roseman 1989 measured it dominating Morton for range queries):
    * consecutive curve positions are ALWAYS spatially adjacent, where
    * the Morton curve takes a long diagonal "seam" jump every time a
    * quadrant closes.
    *
    * Where the advantage does and does NOT appear — measured, because
    * the intuition misleads: a fixed-width PREFIX bucket at EVEN k
    * (top k bits) of either curve is the same depth-k/2 quadtree cell,
    * the two curves only LABEL the cells differently, so prefix zone
    * maps ([[zoneMap]] vs [[hilbertZoneMap]]) prune IDENTICALLY
    * (LayoutSpec pins it; at odd k the cells differ but neither curve
    * systematically wins). The
    * locality pays off exactly when buckets are curve-contiguous
    * EQUAL-COUNT chunks — i.e. real FILES written by a cluster-by
    * job, whose boundaries fall at arbitrary curve positions: a chunk
    * spanning a Morton seam gets a bounding box bloated by the
    * diagonal jump, a Hilbert chunk never does
    * ([[curveFileMap]]; the `hilbert_pruning` oracle measures the
    * same box query reading ~2x fewer candidate rows under Hilbert
    * file chunks on lineitem).
    *
    * Same contract as zValue: mask/normalize inputs to 16 bits first.
    * A codegen kernel rather than builtin composition because each
    * scale level's rotation reads BOTH coordinates — a Column
    * unrolling doubles per level ([[graft.functions.Kernels.hilbert]]);
    * the cost is the same ~dozen long ops per row inside
    * WholeStageCodegen.
    */
  def hilbertValue(x: Column, y: Column): Column =
    graft.functions.Kernels.hilbertCol(
      x.cast("long").bitwiseAND(lit(0xFFFFL)),
      y.cast("long").bitwiseAND(lit(0xFFFFL)), bits = 16)

  /** Bit-spread the low 16 bits of `c` to every THIRD position
    * 0,3,..45 (the 3-D Morton mask chain — the standard published
    * constants for 21-bit spreading, which cover the 16-bit case).
    */
  private def spread16x3(c: Column): Column =
    Seq((32, 0x1f00000000ffffL), (16, 0x1f0000ff0000ffL),
      (8, 0x100f00f00f00f00fL), (4, 0x10c30c30c30c30c3L),
      (2, 0x1249249249249249L))
      .foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
        case (v, (s, m)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
      }

  /** 48-bit 3-D Morton value of three dimensions, each masked to its
    * low 16 bits — what `OPTIMIZE ... ZORDER BY (a, b, c)` computes
    * when three predicate columns share the scans: bit i of `x` lands
    * at 3i, of `y` at 3i+1, of `z` at 3i+2. Same contract and cost
    * class as [[zValue]] (pure long projection, ~15 ops per row,
    * bit-portable); normalize each input with [[normalize16]] first.
    * More dimensions buy broader predicate coverage at the price of
    * coarser per-dimension resolution per curve level — the standard
    * ZORDER trade, measured head-to-head in `zorder3_pruning`.
    */
  def zValue3(x: Column, y: Column, z: Column): Column =
    spread16x3(x)
      .bitwiseOR(shiftleft(spread16x3(y), 1))
      .bitwiseOR(shiftleft(spread16x3(z), 2))

  /** [[zoneMap]] in three dimensions over [[zValue3]]: per-prefix-bucket
    * min/max of ALL THREE dims + count, one map-side-combining agg.
    * Output: (bucket, min_x, max_x, min_y, max_y, min_z, max_z, n_rows).
    */
  def zoneMap3(df: DataFrame, x: Column, y: Column, z: Column,
               bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16,
      s"bucketBits must be in [1,16], got $bucketBits")
    val xs = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ys = y.cast("long").bitwiseAND(lit(0xFFFFL))
    val zs = z.cast("long").bitwiseAND(lit(0xFFFFL))
    df.select(xs.as("__x"), ys.as("__y"), zs.as("__z"),
        shiftright(zValue3(x, y, z), 48 - bucketBits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"),
        min(col("__z")).as("min_z"), max(col("__z")).as("max_z"),
        count(lit(1)).as("n_rows"))
  }

  /** 3-D box pruning stats over a [[zoneMap3]] frame — the 2-D
    * [[pruningStats]] test extended with the third dimension.
    */
  def pruningStats3(zoneMap: DataFrame, x0: Column, x1: Column,
                    y0: Column, y1: Column,
                    z0: Column, z1: Column): DataFrame = {
    val cand = col("min_x") <= x1 && col("max_x") >= x0 &&
      col("min_y") <= y1 && col("max_y") >= y0 &&
      col("min_z") <= z1 && col("max_z") >= z0
    zoneMap.agg(
      count(lit(1)).as("n_buckets"),
      coalesce(sum(when(cand, 1L).otherwise(0L)), lit(0L))
        .as("n_candidate_buckets"),
      coalesce(sum(when(cand, col("n_rows")).otherwise(0L)), lit(0L))
        .as("n_candidate_rows"))
  }

  /** Scale a non-negative column with known domain max to the full
    * 16-bit range: (v * 65535) div maxVal — exact integer arithmetic
    * (one multiply, one floor division), monotone, portable across
    * engines bit-for-bit. `maxVal` is the column's domain bound, which
    * a production job reads from table stats; values above it clamp
    * (a stale stats bound must not corrupt the interleave, only
    * coarsen the tail bucket).
    */
  def normalize16(v: Column, maxVal: Long): Column = {
    require(maxVal >= 1, s"maxVal must be >= 1, got $maxVal")
    // 65535 * maxVal must stay exactly representable in double for the
    // remainder-subtraction floor division below to be exact
    require(maxVal <= (1L << 37),
      s"maxVal must be <= 2^37, got $maxVal")
    val a = least(greatest(v.cast("long"), lit(0L)), lit(maxVal)) *
      lit(65535L)
    // exact floor division: subtract the remainder first so the double
    // division is of an exact multiple (bit-exact, unlike floor(a/b)
    // whose quotient can round up across an integer boundary)
    ((a - pmod(a, lit(maxVal))) / lit(maxVal)).cast("long")
  }

  /** [[normalize16]] with the domain bound as a COLUMN — the form a
    * production job uses with a broadcast 1-row stats frame (max of
    * the column from table stats), and the form the registered queries
    * use so the layout stays meaningful at every scale factor. Same
    * exact remainder-subtraction floor division; the caller owns the
    * 2^37 bound on the stat's value.
    */
  def normalize16(v: Column, maxVal: Column): Column = {
    val m = maxVal.cast("long")
    val a = least(greatest(v.cast("long"), lit(0L)), m) * lit(65535L)
    ((a - pmod(a, m)) / m).cast("long")
  }

  /** Fixed-width zone map over the z-curve: bucket = the z-value's top
    * `bucketBits` bits (2^bucketBits buckets of equal curve-length),
    * with per-bucket min/max of both dimensions and a row count — the
    * stats a scan planner consults before touching data. Fixed-width
    * prefix bucketing (vs ntile/repartitionByRange) is deliberate:
    * the bucket id is a pure projection of the row, so the whole zone
    * map is ONE map-side-combining aggregation with no global sort,
    * no sampled range boundaries, and a deterministic result any
    * engine reproduces bit-for-bit. Buckets sparse regions simply
    * produce no row for.
    *
    * Output: (bucket, min_x, max_x, min_y, max_y, n_rows).
    */
  def zoneMap(df: DataFrame, x: Column, y: Column,
              bucketBits: Int = 6): DataFrame =
    curveZoneMap(df, x, y, zValue(x, y), bucketBits)

  /** [[zoneMap]] over the HILBERT curve instead of Morton — same
    * fixed-width prefix bucketing (2^bucketBits equal curve-length
    * buckets), same one-aggregation plan, same merge algebra
    * ([[mergeZoneMaps]] is curve-agnostic: it only sees buckets and
    * boxes). Prefix buckets of the two curves are the SAME quadtree
    * cells relabeled, so this prunes exactly like [[zoneMap]] — its
    * oracle pins the WALK's arithmetic; the pruning advantage lives in
    * [[curveFileMap]]'s equal-count chunks ([[hilbertValue]] scaladoc).
    */
  def hilbertZoneMap(df: DataFrame, x: Column, y: Column,
                     bucketBits: Int = 6): DataFrame =
    curveZoneMap(df, x, y, hilbertValue(x, y), bucketBits)

  private def curveZoneMap(df: DataFrame, x: Column, y: Column,
                           curve: Column, bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16,
      s"bucketBits must be in [1,16], got $bucketBits")
    val xs = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ys = y.cast("long").bitwiseAND(lit(0xFFFFL))
    df.select(xs.as("__x"), ys.as("__y"),
        shiftright(curve, 32 - bucketBits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-bucket RAW-value min/max boxes of arbitrary columns — the
    * stats frame [[graft.plans.ZoneMapPruning]] consumes, distinct
    * from [[zoneMap]] (which boxes the NORMALIZED 16-bit curve inputs
    * for pruning-stats arithmetic): the optimizer rule rewrites
    * predicates over the raw columns, so its boxes must be raw too.
    * Any column a range predicate can serve works — integral columns
    * box numerically, STRING columns box in binary UTF-8 order (the
    * engine's own string comparison), which is exactly the
    * reference's date-encoded-path pattern (`zoom_proc.py:325-336`,
    * `jhub_proc.py:258-276`: `load_date`/ISO-timestamp strings are
    * the most common real-world pruning predicate). Output:
    * `(bucket, min_<c>, max_<c> per dim, n_rows)`, min/max in the
    * column's native type; ONE map-side-combining aggregation,
    * bucket-bounded output.
    *
    * A cluster-by write computes this over the rows it is writing
    * anyway and persists it NEXT TO the table (the `<path>.__zonemap`
    * convention `zonemap_prune_scan` uses), so scan-time registration
    * is a metadata read — never a table rescan.
    */
  def rawZoneMap(df: DataFrame, bucket: Column, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "rawZoneMap needs at least one dimension")
    val aggs = dims.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(bucket.as("bucket")).agg(aggs.head, aggs.tail: _*)
  }

  /** [[mergeZoneMaps]] for [[rawZoneMap]] frames: per-bucket box union
    * (min of mins, max of maxes — associative-commutative in both the
    * numeric and the binary-string order) + row-count sum, so
    * per-slice stats fold to the union's stats EXACTLY and history is
    * never rescanned. `dims` must match the frames' `min_/max_`
    * columns.
    */
  def mergeRawZoneMaps(dims: Seq[String])(maps: DataFrame*): DataFrame = {
    require(maps.nonEmpty, "mergeRawZoneMaps needs at least one zone map")
    val aggs = dims.flatMap { c =>
      Seq(min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"))
    } :+ sum(col("n_rows")).as("n_rows")
    maps.reduce(_ unionByName _)
      .groupBy(col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Single-key zone map with the same bucket count: rows bucketed by
    * the top `bucketBits` bits of `x` alone (the layout a table sorted
    * only by `x` gives you) — the comparison baseline for
    * [[pruningStats]].
    */
  def linearZoneMap(df: DataFrame, x: Column, y: Column,
                    bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16,
      s"bucketBits must be in [1,16], got $bucketBits")
    val xs = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ys = y.cast("long").bitwiseAND(lit(0xFFFFL))
    df.select(xs.as("__x"), ys.as("__y"),
        shiftright(xs, 16 - bucketBits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"),
        count(lit(1)).as("n_rows"))
  }

  /** The FILE layout a cluster-by-curve write produces, as a
    * deterministic stats frame: rows ranked by (curve, x, y) and cut
    * into `numChunks` curve-contiguous EQUAL-COUNT chunks (the file
    * boundaries of a clustered write), with per-chunk min/max boxes —
    * schema-compatible with [[zoneMap]] so [[pruningStats]] consumes
    * it unchanged. This is where curve CHOICE matters ([[hilbertValue]]
    * scaladoc): chunk boundaries fall at arbitrary curve positions, so
    * a Morton seam inside a chunk bloats its box while Hilbert chunks
    * stay compact.
    *
    * Determinism anchor, not a production writer: the global
    * row_number (one-partition sort window) exists so the chunking —
    * and therefore the oracle hash — is engine-reproducible, ties
    * resolved by (curve, x, y), identical rows interchangeable without
    * affecting any chunk's stats. A production job writes with
    * [[clusterByZ]]-style repartitionByRange (sampled boundaries,
    * fully parallel) and reads these boxes back from parquet row-group
    * stats; same division of labour as zoneMap-vs-clusterByZ.
    */
  def curveFileMap(df: DataFrame, x: Column, y: Column, curve: Column,
                   numChunks: Int): DataFrame = {
    require(numChunks >= 1, s"numChunks must be >= 1, got $numChunks")
    val xs = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val ys = y.cast("long").bitwiseAND(lit(0xFFFFL))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c"), col("__x"), col("__y"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy() // whole frame; same single sort pass as the rank
    df.select(xs.as("__x"), ys.as("__y"), curve.as("__c"))
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("bucket", expr(s"(__rn * ${numChunks}L) div __n"))
      .groupBy(col("bucket"))
      .agg(min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"),
        count(lit(1)).as("n_rows"))
  }

  /** How much a box predicate (x ∈ [x0,x1] ∧ y ∈ [y0,y1]) can skip
    * under a zone map: a bucket is a CANDIDATE iff its [min,max] box
    * overlaps the query box on BOTH dimensions (the standard min/max
    * skipping test — sound, never prunes a matching row). One row:
    * (n_buckets, n_candidate_buckets, n_candidate_rows) — the scan
    * planner's work estimate; candidate rows / total rows is the
    * fraction of the table the engine actually reads.
    */
  def pruningStats(zoneMap: DataFrame,
                   x0: Long, x1: Long, y0: Long, y1: Long): DataFrame =
    pruningStats(zoneMap, lit(x0), lit(x1), lit(y0), lit(y1))

  /** [[pruningStats]] with Column bounds — pass bounds derived from a
    * broadcast stats frame (cross-join it onto the zone map first).
    */
  def pruningStats(zoneMap: DataFrame, x0: Column, x1: Column,
                   y0: Column, y1: Column): DataFrame = {
    val cand = col("min_x") <= x1 && col("max_x") >= x0 &&
      col("min_y") <= y1 && col("max_y") >= y0
    zoneMap.agg(
      count(lit(1)).as("n_buckets"),
      coalesce(sum(when(cand, 1L).otherwise(0L)), lit(0L))
        .as("n_candidate_buckets"),
      coalesce(sum(when(cand, col("n_rows")).otherwise(0L)), lit(0L))
        .as("n_candidate_rows"))
  }

  /** Merge zone maps built over disjoint slices of a table (per-file,
    * per-day, per-ingest-batch) into the zone map of the union — the
    * algebra that makes layout stats MAINTAINABLE at 100 TB: a new
    * ingest computes its own (tiny) zone map and one bucket-keyed agg
    * folds it in; the historical data is never rescanned. min/max/sum
    * are all associative-commutative, so merge(zm(A), zm(B)) ≡
    * zm(A ∪ B) exactly (the registered identity gate asserts it
    * in-plan).
    */
  def mergeZoneMaps(maps: DataFrame*): DataFrame = {
    require(maps.nonEmpty, "mergeZoneMaps needs at least one zone map")
    maps.reduce(_ unionByName _)
      .groupBy(col("bucket"))
      .agg(min(col("min_x")).as("min_x"), max(col("max_x")).as("max_x"),
        min(col("min_y")).as("min_y"), max(col("max_y")).as("max_y"),
        sum(col("n_rows")).as("n_rows"))
  }

  /** Production layout writer: range-partition by z-value into
    * `numPartitions` output files and sort within each — what an
    * OPTIMIZE ZORDER job does before writing parquet (row-group
    * min/max stats then play the zone map's role). Range boundaries
    * come from sampling, so this is for WRITING data, not for
    * oracle-checked derivations — [[zoneMap]]'s fixed-width prefix is
    * the deterministic twin.
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
                 numPartitions: Int): DataFrame = {
    require(numPartitions >= 1,
      s"numPartitions must be >= 1, got $numPartitions")
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
