package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. First resort at runtime is AQE's skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on by default);
  * explicit salting remains necessary when the skewed side feeds an
  * aggregation-free shuffle join whose hot keys AQE cannot split further
  * (e.g. a single key holding >> one partition's worth of rows on BOTH
  * sides), or when stats are unavailable to the planner.
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a dimension too large
    * to broadcast: the fact side gets a deterministic salt in
    * [0, salt), the dimension is replicated `salt` times, and the join
    * key becomes (key, salt) — a hot key's rows now land on `salt`
    * reducers instead of one. Row multiplicity is preserved exactly
    * (each fact row joins the single replica carrying its salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // dim-preserving types (right/full outer) would surface every
    // unmatched REPLICA — up to `salt` phantom rows per dim row
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "semi", "left_anti", "leftanti", "anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin preserves multiplicity only for fact-preserving join types, got $joinType")
    // Spread must be independent of row CONTENT: hashing the row would
    // send fully-identical duplicate rows of a hot key to ONE salt bucket
    // (zero mitigation in the degenerate skew case). The join RESULT is
    // deterministic for any salt assignment, so a per-row id is safe.
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for high-cardinality-skewed counts where a
    * single group dwarfs the rest: pre-aggregate on (key, salt), then
    * combine per key. (Spark's hash aggregate already does map-side
    * partial aggregation; this helps when the PARTIAL results of one key
    * still overflow a single reducer — e.g. count-distinct style
    * payloads.)
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
