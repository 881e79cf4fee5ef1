package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point timestamp against right
  * rows with [start, end) intervals.
  *
  * Spark has no native range-join strategy, so the naive
  * `l.join(r, ts >= start && ts < end)` plans as a broadcast
  * nested-loop / cartesian — quadratic, the classic scale-killer.
  * Bucketizing time into `granuleSeconds` cells turns it into an
  * EQUI-join: each point belongs to exactly one cell, each interval is
  * replicated to every cell it overlaps (`explode(sequence(...))`), the
  * cell equi-join generates candidates and the exact predicate verifies
  * them. A (point, interval) pair can only meet in the point's single
  * cell, so no post-join dedup is needed.
  *
  * Cost model: interval replication factor ≈ duration/granule + 1 —
  * pick the granule near the typical interval length (replication ~2)
  * so the join stays a hash join on a well-distributed key. Skewed hot
  * cells (everything in one hour) are the documented caveat: shrink the
  * granule to split a dominant cell (costs more interval replicas), or
  * let AQE's skew-join handle the residual imbalance.
  */
object RangeJoin {

  /** `tsCol` names the left timestamp column; `startCol`/`endCol` name
    * the right interval bounds (end EXCLUSIVE). All other columns of
    * both sides are carried through. Column names must not collide
    * across sides (pre-alias if they do), and neither side may contain
    * the reserved internal column `__range_cell`.
    *
    * `maxCellsPerInterval` guards the replication: one dirty interval
    * (a sentinel end date, a corrupted bound) would otherwise explode
    * into millions of cells and OOM the join — such a row FAILS the job
    * loudly (assert_true) instead.
    */
  /** With `broadcastRight = true` the replicated interval side is
    * broadcast, so the (usually much larger) point side is never
    * shuffled at all — the right call when intervals are a filtered
    * slice (incidents, maintenance windows, campaigns). Leave false when
    * both sides are large; the cell equi-join then shuffles both.
    *
    * `saltBuckets > 1` handles the HOT-CELL case (everything in one
    * hour): the point side's join key gains a salt in [0, saltBuckets)
    * and each interval cell is replicated once per salt, so a dominant
    * cell's rows spread over `saltBuckets` reducers instead of one.
    * Costs saltBuckets× extra interval replicas — cheap when intervals
    * are the small side, which is exactly the hot-cell scenario. Result
    * multiplicity is unchanged (each point joins the single replica
    * carrying its salt).
    *
    * The salt is a DETERMINISTIC hash of the point row's columns — a
    * nondeterministic spread (row id, rand) used as a shuffle-join key
    * can move a row between salt buckets when a lost map partition is
    * recomputed, duplicating or dropping it from the join. The
    * trade-off: fully identical duplicate point rows share a bucket and
    * don't spread — dedup them first (they produce identical output
    * rows anyway); distinct rows in a hot hour spread fine.
    */
  def rangeJoin(left: DataFrame, tsCol: String,
                right: DataFrame, startCol: String, endCol: String,
                granuleSeconds: Long,
                maxCellsPerInterval: Long = 10000L,
                broadcastRight: Boolean = false,
                saltBuckets: Int = 1): DataFrame = {
    require(granuleSeconds > 0, s"granuleSeconds must be positive, got $granuleSeconds")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val cell = "__range_cell"
    val salt = "__range_salt"
    require(!left.columns.contains(cell) && !right.columns.contains(cell),
      s"$cell is reserved by rangeJoin; rename the input column")
    require(!left.columns.contains(salt) && !right.columns.contains(salt),
      s"$salt is reserved by rangeJoin; rename the input column")
    val lCell = left.withColumn(cell,
      floor(col(tsCol).cast("long") / granuleSeconds))
    val l = (if (saltBuckets > 1)
      lCell.withColumn(salt,
        pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*),
          lit(saltBuckets)).cast("int"))
    else lCell).alias("l")
    // cover through floor(end/g): second-truncation of a fractional end
    // must not drop the last cell a point could truncate into. Cells are
    // distinct per interval, so candidates stay unique per pair.
    val firstCell = floor(col(startCol).cast("long") / granuleSeconds)
    val lastCell = floor(col(endCol).cast("long") / granuleSeconds)
    // the assert lives INSIDE the cell expression's dataflow (a separate
    // guard column would be pruned away unused and never evaluated):
    // assert_true yields null on success, so the when() wrapper always
    // takes the sequence branch — or raises with the offending bounds
    val guardedCells = when(
      assert_true(lastCell - firstCell < lit(maxCellsPerInterval),
        concat(lit(s"rangeJoin: interval wider than maxCellsPerInterval=" +
          s"$maxCellsPerInterval cells (granule ${granuleSeconds}s) at "),
          col(startCol).cast("string"), lit(".."), col(endCol).cast("string")))
        .isNull,
      sequence(firstCell, lastCell))
    val rCell = right.withColumn(cell, explode(guardedCells))
    val rRaw = (if (saltBuckets > 1)
      rCell.withColumn(salt, explode(sequence(lit(0), lit(saltBuckets - 1))))
    else rCell).alias("r")
    val r = if (broadcastRight) broadcast(rRaw) else rRaw
    val baseCond =
      col(s"l.$cell") === col(s"r.$cell") &&
        col(s"l.$tsCol") >= col(s"r.$startCol") &&
        col(s"l.$tsCol") < col(s"r.$endCol")
    val cond = if (saltBuckets > 1)
      baseCond && col(s"l.$salt") === col(s"r.$salt") else baseCond
    l.join(r, cond).drop(cell).drop(salt)
  }
}
