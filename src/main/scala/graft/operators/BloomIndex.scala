package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-level Bloom index — the EQUALITY twin of the zone-map family
  * (`Layout`): zone maps prune range scans on the clustered columns,
  * but a point lookup on a NON-clustered high-cardinality column
  * ("which files mention customer 42?") reads everything. Every
  * lakehouse pairs min/max stats with per-file Bloom filters for
  * exactly this case (Parquet bloom_filter_enabled, Delta
  * bloomFilterIndex); this is that index as data, mergeable and
  * engine-portable.
  *
  * Representation: one row per `(chunk, word)` where `word` is a
  * 63-bit slice of an `mBits`-wide filter and `bitmap` ORs the
  * membership bits of every key in the chunk. Bit positions come from
  * k independent md5 streams (`key#bloom{i}`, first 15 hex chars →
  * 60-bit int, mod mBits) — the repo's portable-hash convention, so
  * DuckDB can rebuild the index bit-for-bit and the whole family is
  * oracle-checkable, false positives included. Words with no bits set
  * are simply absent (sparse), which reads as all-zero on the probe
  * side.
  *
  * Scale shape: the build is one projected scan + a
  * map-side-combining `bit_or` aggregation keyed on (chunk, word) —
  * the index is `chunks × ceil(mBits/63)` rows max, millions of times
  * smaller than the table. The probe side BROADCASTS (a query carries
  * tens of keys; each key explodes to ≤k (word, mask) rows), so
  * candidate selection never shuffles the index, and the index itself
  * never rescans the table. Merging two chunks' filters is `bit_or`
  * over the same layout — the same algebra `Layout.mergeZoneMaps`
  * uses, so compaction can fold Bloom filters without re-reading
  * rows.
  */
object BloomIndex {

  /** k md5-derived bit positions in [0, mBits) for `key`. */
  private def positions(key: Column, k: Int, mBits: Int): Column =
    array((0 until k).map { i =>
      conv(substring(md5(concat(key.cast("string"), lit(s"#bloom$i"))),
        1, 15), 16, 10).cast("long") % mBits
    }: _*)

  // 63-bit words: bits 0..62 of a BIGINT, never the sign bit — a shift
  // into bit 63 is signed overflow, which DuckDB (the oracle engine)
  // rejects outright, and keeping bitmaps non-negative makes every
  // rendering/ordering question moot. One bit of 64 sacrificed for a
  // fully portable layout.
  private val WordBits = 63

  private def wordOf(pos: Column): Column =
    floor(pos / WordBits).cast("long")

  private def maskOf(pos: Column): Column =
    // the Scala shiftleft() overload only takes a literal shift; the SQL
    // function accepts a column
    call_function("shiftleft", lit(1L), (pos % WordBits).cast("int"))

  /** Build the index: `(chunk, word, bitmap)`, sparse. Null keys are
    * skipped (a Bloom filter answers "might equal v" for non-null v;
    * null-freedom is a constraint, not an index question).
    */
  def build(df: DataFrame, chunk: Column, key: Column,
            k: Int, mBits: Int): DataFrame = {
    require(mBits > 0, "mBits must be positive")
    require(k > 0, "need at least one hash")
    df.where(key.isNotNull)
      .select(chunk.as("chunk"), explode(positions(key, k, mBits)).as("pos"))
      .select(col("chunk"), wordOf(col("pos")).as("word"),
        maskOf(col("pos")).as("mask"))
      .groupBy("chunk", "word")
      .agg(bit_or(col("mask")).as("bitmap"))
  }

  /** Chunks that MAY contain each probe key: `(probe_key, chunk)`.
    * A chunk survives iff every one of the key's bit positions is set
    * — sparse words count as zero, so a missing word eliminates the
    * chunk. The probe side is broadcast; the index is never shuffled.
    */
  def candidates(index: DataFrame, probes: DataFrame, probeKey: Column,
                 k: Int, mBits: Int): DataFrame = {
    val p = probes
      .select(probeKey.cast("string").as("probe_key")).distinct()
      .select(col("probe_key"),
        explode(positions(col("probe_key"), k, mBits)).as("pos"))
      .select(col("probe_key"), wordOf(col("pos")).as("word"),
        maskOf(col("pos")).as("mask"))
      .distinct() // two hash streams can land on one bit; need counts pairs
    val need = p.groupBy("probe_key").agg(count(lit(1)).as("__need"))
    index
      .join(broadcast(p), Seq("word"))
      .where((col("bitmap").bitwiseAND(col("mask"))) === col("mask"))
      .groupBy("probe_key", "chunk")
      .agg(count(lit(1)).as("__hits"))
      .join(broadcast(need), Seq("probe_key"))
      .where(col("__hits") === col("__need"))
      .select(col("probe_key"), col("chunk"))
  }

  /** Merge an index whose chunks have been coalesced (`chunk →
    * mergedChunk`, e.g. after compaction): same layout, `bit_or` per
    * (merged chunk, word) — no table rescan, mirroring
    * `Layout.mergeZoneMaps`.
    */
  def merge(index: DataFrame, mergedChunk: Column): DataFrame =
    index.groupBy(mergedChunk.as("chunk"), col("word"))
      .agg(bit_or(col("bitmap")).as("bitmap"))
}
