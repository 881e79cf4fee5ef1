package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. First resort at runtime is AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on by default);
  * explicit salting remains necessary when the skewed side feeds an
  * aggregation-free shuffle join whose hot keys AQE cannot split further
  * (e.g. a single key holding >> one partition's worth of rows on BOTH
  * sides), or when stats are unavailable to the planner.
  */
object Skew {

  /** Salt column in [0, salt): `xxhash64` of `saltSource` when given
    * (pass a UNIQUE, stable column — a primary id — for a salt that is
    * a pure function of the data: replay-deterministic under ANY retry,
    * and content-independent across a hot key's rows because the id
    * disambiguates even fully-identical payloads), else of
    * `monotonically_increasing_id()`.
    *
    * PRECONDITION for the MID default: the input must come straight
    * from a deterministic scan (file/table read), where partition
    * composition and in-partition order are stable under task retry. A
    * post-SHUFFLE input breaks that — reduce-side fetch order is
    * nondeterministic, so a retried map task can re-salt rows
    * differently after some reducers already fetched its output (the
    * SPARK-23207 class of bug: duplicated/lost rows, not just different
    * salts). Callers feeding shuffled lineage must pass `saltSource`.
    */
  private def saltCol(salt: Int, saltSource: Option[Column]): Column =
    pmod(xxhash64(saltSource.getOrElse(monotonically_increasing_id())),
      lit(salt)).cast("int")

  /** Salted equi-join of a skewed fact side against a dimension too large
    * to broadcast: the fact side gets a salt in [0, salt), the dimension
    * is replicated `salt` times, and the join key becomes (key, salt) —
    * a hot key's rows now land on `salt` reducers instead of one. Row
    * multiplicity is preserved exactly (each fact row joins the single
    * replica carrying its salt).
    *
    * Spread must be independent of row CONTENT: hashing the row would
    * send fully-identical duplicate rows of a hot key to ONE salt bucket
    * (zero mitigation in the degenerate skew case). Pass `saltSource` =
    * a unique id column for a fully replay-deterministic salt; the
    * default derives it from `monotonically_increasing_id()` and
    * REQUIRES `fact` to be deterministic-scan output (see [[saltCol]]).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int, joinType: String = "inner",
                 saltSource: Option[Column] = None): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // dim-preserving types (right/full outer) would surface every
    // unmatched REPLICA — up to `salt` phantom rows per dim row
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "semi", "left_anti", "leftanti", "anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin preserves multiplicity only for fact-preserving join types, got $joinType")
    val salted = fact.withColumn("__salt", saltCol(salt, saltSource))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for high-cardinality-skewed counts where a
    * single group dwarfs the rest: pre-aggregate on (key, salt), then
    * combine per key. (Spark's hash aggregate already does map-side
    * partial aggregation; this helps when the PARTIAL results of one key
    * still overflow a single reducer — e.g. count-distinct style
    * payloads.) Same `saltSource` contract as [[saltedJoin]] — though
    * here ANY salt assignment yields the same final sums, so the MID
    * default is retry-safe for the RESULT; the precondition only
    * matters if the partials themselves are exposed.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salt: Int, saltSource: Option[Column] = None): DataFrame = {
    require(salt > 1, "salt must be > 1")
    df.withColumn("__salt", saltCol(salt, saltSource))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
