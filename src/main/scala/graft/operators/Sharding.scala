package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard assignment — the last step of a corpus pipeline
  * before the data loader: give every document a stable shard number in
  * [0, numShards) so the corpus can be written as a fixed set of
  * balanced files (`.write.partitionBy("shard")`) that trainers stream
  * independently.
  *
  * The assignment is a HASH RANGE over md5 hex, not `hash() % n`: the
  * shard key is the first 4 hex chars of md5(salt ‖ id) and shard i
  * owns the keyspace slice [i·65536/n, (i+1)·65536/n). Three properties
  * this buys at 100 TB:
  *  - pure projection, ZERO shuffle — assignment rides the scan and the
  *    writer's partitionBy does the only exchange, exactly once;
  *  - engine-portable — md5 of the id string reproduces bit-for-bit in
  *    any engine (the repo-wide md5-rank convention, cf.
  *    [[graft.operators.Sampling.hashSplit]]), so a resharding audit in
  *    another system agrees on every row, which `hash() % n` (engine
  *    murmur) cannot;
  *  - stable under re-partitioning/re-runs — a pure function of the id,
  *    no row_number, no ordering dependence.
  *
  * Balance comes from md5 uniformity: E[shard size] = N/numShards with
  * multinomial concentration (±O(√(N/numShards))), the same guarantee
  * hash-mod gives. A boundary list (vs mod) additionally keeps shard
  * ranges CONTIGUOUS in key space, so a later re-shard to a multiple of
  * `numShards` is a pure split of each file — no global reshuffle.
  */
object Sharding {

  /** 4-hex-digit lower-case boundary keys for `numShards` equal slices
    * of the 16-bit key space: boundary(i) = floor(i·65536/numShards).
    * Exposed for specs and for writing the DuckDB oracle.
    */
  def boundaries(numShards: Int): Seq[String] = {
    require(numShards >= 1 && numShards <= 65536,
      s"numShards must be in [1, 65536]: $numShards")
    (1 until numShards).map { i =>
      f"${(i.toLong * 65536L / numShards).toInt}%04x"
    }
  }

  /** Shard key (first 4 md5 hex chars, the salt prefixed exactly like
    * Sampling's md5-rank keys).
    */
  def shardKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 4)

  /** Adds `shard_key` and `shard` to `docs`. The shard is the count of
    * boundaries at or below the key — a branch-free sum of string
    * comparisons (hex compares identically as ASCII), all codegen.
    */
  def assignShards(docs: DataFrame, id: Column, numShards: Int,
                   salt: String = "graft"): DataFrame = {
    val key = shardKey(id, salt)
    val shard = boundaries(numShards)
      .map(b => when(key >= lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    docs.withColumn("shard_key", key).withColumn("shard", shard)
  }

  /** Per-shard audit: document count, token mass and the observed key
    * range — the balance report a resharding decision reads. One
    * map-side-combinable aggregation; `numShards` stays small (the
    * output is one row per shard), so the result is a driver-sized
    * frame no matter the corpus size.
    */
  def shardStats(sharded: DataFrame, tokenCount: Column): DataFrame =
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("total_tokens"),
        min(col("shard_key")).as("min_key"),
        max(col("shard_key")).as("max_key"))
}
