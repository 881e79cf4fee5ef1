package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a keyed changeset (upserts +
  * deletes, each stamped with a monotone sequence) to a base snapshot —
  * the `MERGE INTO` / SCD-type-1 primitive behind nightly corpus
  * refreshes ("fold today's crawl delta into the canonical document
  * table") and serving-table maintenance. [[Snapshot.diff]] answers
  * "what changed between two full snapshots"; this operator goes the
  * other way: given the delta, PRODUCE the next snapshot without
  * rewriting rows that didn't move.
  *
  * Semantics (latest-wins, per key):
  *   - multiple change rows for one id collapse to the single row with
  *     the highest `seq` (the contract requires (id, seq) unique —
  *     CDC streams are per-key ordered, so a real feed satisfies this
  *     for free; ties would make the merge feed-order-dependent, which
  *     is exactly the nondeterminism a snapshot must not have);
  *   - winning op `upsert`: the change's payload replaces (or, for an
  *     id absent from base, inserts) the row;
  *   - winning op `delete`: the id leaves the snapshot; a delete for an
  *     id not in base is a no-op (idempotent replay of an old delta
  *     must not fail);
  *   - ids untouched by the changeset pass through byte-identical.
  *
  * Scale shape: the latest-wins collapse is a window keyed on id and
  * the merge is a full-outer join keyed on id — the SAME hash
  * partitioning, so Catalyst plans ONE exchange for the change side
  * (the window's) and reuses it for the join; the base side pays one
  * exchange, or ZERO when the base snapshot is stored bucketed by id
  * ([[graft.sinks.ParquetSink.writeBucketed]] — the nightly-refresh
  * layout: the table is bucketed precisely so every day's merge can
  * stream it through without a shuffle). The elision requires the
  * delta's shuffle to land ON the bucket count: EnsureRequirements
  * co-partitions a join on the larger child partitioning, so
  * `spark.sql.shuffle.partitions` above the bucket count makes it
  * re-shuffle the bucketed base instead of reusing it — choose the
  * bucket count as the merge job's shuffle parallelism (the
  * PlanAuditSpec bucketed-base audit pins exactly this relationship). The changeset is typically
  * orders of magnitude smaller than the base (a day's delta vs the
  * corpus); everything downstream of the collapse is row-linear in
  * |base| + |delta|, and nothing is ever collected to the driver.
  */
object Cdc {

  /** Collapse a changeset to its latest change per id: the row with the
    * highest `seq` wins. One window (= one exchange keyed on id).
    */
  def latestChangePerKey(changes: DataFrame, id: String,
                         seq: String): DataFrame =
    changes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(id)).orderBy(col(seq).desc)))
      .where(col("__rn") === 1)
      .drop("__rn")

  /** Schema evolution for the merge pair below: a changeset may carry
    * columns the base has never seen (the schema-on-read reality this
    * engine mirrors — a new JSON field simply appears one day, so the
    * CDC feed widens before the canonical table does). The base WIDENS
    * to the union — new columns appended with the changeset's type,
    * existing base rows null-filled, exactly parquet `mergeSchema`
    * semantics — while a column present on BOTH sides with a
    * DIFFERENT type fails loudly up front: silently casting would
    * corrupt every pre-existing row, and picking a winner is a schema
    * migration decision no merge job should make implicitly. Missing
    * base columns on the change side also fail up front (an upsert's
    * payload replaces the whole row, so a column it doesn't carry
    * would have to be invented).
    *
    * Returns the widened base; the merge then proceeds unchanged —
    * widening is a pure pre-step, so the one-window + one-join plan
    * shape and its single change-side exchange are untouched.
    */
  private def widenForChanges(base: DataFrame, changes: DataFrame,
                              id: String, nonPayload: Set[String]): DataFrame = {
    val cTypes = changes.schema.map(f => f.name -> f.dataType).toMap
    val bTypes = base.schema.map(f => f.name -> f.dataType).toMap
    val conflicts = (bTypes.keySet & cTypes.keySet)
      .filter(c => bTypes(c) != cTypes(c)).toSeq.sorted
    require(conflicts.isEmpty,
      "Cdc: changeset type conflicts with base on " +
        conflicts.map(c => s"$c (base ${bTypes(c).simpleString} vs " +
          s"change ${cTypes(c).simpleString})").mkString(", ") +
        " — resolve the schema migration explicitly before merging")
    val missing = (bTypes.keySet -- nonPayload -- cTypes.keySet).toSeq.sorted
    require(missing.isEmpty,
      s"Cdc: changeset is missing base payload columns " +
        s"${missing.mkString(", ")} — an upsert replaces the whole row, " +
        "so every base column must be carried")
    val newCols = changes.columns
      .filterNot(nonPayload ++ bTypes.keySet).toSeq
    newCols.foldLeft(base)((d, c) => d.withColumn(c, lit(null).cast(cTypes(c))))
  }

  /** The merged next snapshot, schema ≡ `base.schema` widened by any
    * NEW changeset columns ([[widenForChanges]] — untouched rows get
    * null there). `changes` must carry every base column plus `seq`
    * (monotone per id, (id, seq) unique) and `op` ∈ {upsert, delete};
    * an unknown op fails the job in-plan (a silent skip would quietly
    * resurrect deleted rows on the next full rebuild), and a
    * same-name/different-type column fails at plan assembly.
    */
  def applyChangeSet(base0: DataFrame, changes: DataFrame, id: String,
                     seq: String = "seq", op: String = "op"): DataFrame = {
    val base = widenForChanges(base0, changes, id, Set(id, seq, op))
    val payload = base.columns.filterNot(_ == id).toSeq
    val latest0 = latestChangePerKey(changes, id, seq)
      .select((Seq(col(id), col(op).as("__op")) ++
        payload.map(c => col(c).as(s"__c_$c"))): _*)
      .withColumn("__op",
        when(col("__op").isin("upsert", "delete"), col("__op"))
          .otherwise(raise_error(concat(
            lit("Cdc.applyChangeSet: unknown op '"), col("__op"),
            lit(s"' for $id="), col(id).cast("string")))))
    // presence markers survive the full-outer join where key columns
    // alone cannot (Snapshot.diff's null-content lesson)
    val b = base.withColumn("__in_base", lit(1))
    val c = latest0.withColumn("__in_chg", lit(1))
    b.join(c, Seq(id), "full_outer")
      .where(col("__in_chg").isNull || col("__op") =!= "delete")
      .select((col(id) +: payload.map(p =>
        when(col("__in_chg") === 1, col(s"__c_$p"))
          .otherwise(col(p)).as(p))): _*)
  }

  /** Bootstrap a plain snapshot into the VERSIONED form
    * [[applyChangeSetVersioned]] consumes: applied-seq 0 (every real
    * change outranks the initial load) and no tombstones.
    */
  def versionSnapshot(base: DataFrame): DataFrame =
    base.withColumn("__seq", lit(0L)).withColumn("__deleted", lit(false))

  /** Changeset application for a STORE that is merged repeatedly
    * (micro-batches, daily deltas arriving out of order): the snapshot
    * remembers, per id, the highest sequence it has applied (`__seq`)
    * and keeps deletes as TOMBSTONES (`__deleted`) instead of dropping
    * the row. Both are what make the fold correct across batches:
    *
    *   - a STALE change (seq ≤ the stored one) in a later batch is
    *     ignored — without the stored seq, a delayed early upsert
    *     would overwrite a newer value it lost to;
    *   - a stale upsert arriving after a delete cannot resurrect the
    *     row, because the delete left a tombstone carrying its seq.
    *
    * This gives the associativity that batch boundaries need: folding
    * any partition of a changeset in any batch order yields the same
    * store as one-shot [[applyChangeSet]] of the union (given the
    * global (id, seq)-uniqueness contract) — the registered
    * `cdc_merge_versioned` query asserts exactly that against the
    * one-shot oracle. Tombstones are garbage: [[compactTombstones]]
    * purges those every consumer has seen (the seq-watermark analog of
    * a streaming state timeout). [[snapshotView]] projects the live
    * rows. Same plan shape as [[applyChangeSet]]: one window + one
    * full-outer join, both keyed on id.
    */
  def applyChangeSetVersioned(versionedBase0: DataFrame, changes: DataFrame,
                              id: String, seq: String = "seq",
                              op: String = "op"): DataFrame = {
    val versionedBase = widenForChanges(versionedBase0, changes, id,
      Set(id, seq, op, "__seq", "__deleted"))
    val payload =
      versionedBase.columns.filterNot(Set(id, "__seq", "__deleted")).toSeq
    val latest0 = latestChangePerKey(changes, id, seq)
      .select((Seq(col(id), col(seq).as("__c_seq"), col(op).as("__op")) ++
        payload.map(c => col(c).as(s"__c_$c"))): _*)
      .withColumn("__op",
        when(col("__op").isin("upsert", "delete"), col("__op"))
          .otherwise(raise_error(concat(
            lit("Cdc.applyChangeSetVersioned: unknown op '"), col("__op"),
            lit(s"' for $id="), col(id).cast("string")))))
    val b = versionedBase.withColumn("__in_base", lit(1))
    val c = latest0.withColumn("__in_chg", lit(1))
    val chgWins = col("__in_chg") === 1 &&
      (col("__in_base").isNull || col("__c_seq") > col("__seq"))
    b.join(c, Seq(id), "full_outer")
      .select((Seq(col(id),
        when(chgWins, col("__c_seq")).otherwise(col("__seq")).as("__seq"),
        when(chgWins, col("__op") === "delete")
          .otherwise(col("__deleted")).as("__deleted")) ++
        payload.map(p =>
          when(chgWins, col(s"__c_$p")).otherwise(col(p)).as(p))): _*)
  }

  /** Purge tombstones with seq ≤ `seqWatermark` — safe once every
    * consumer/replayer is past that sequence; a later replay of an
    * older upsert for a purged id re-inserts it, which is exactly the
    * risk the watermark contract states (identical to dropping
    * streaming state past the watermark).
    */
  def compactTombstones(versioned: DataFrame, seqWatermark: Long): DataFrame =
    versioned.where(!(col("__deleted") && col("__seq") <= seqWatermark))

  /** The live snapshot a reader sees: tombstones and bookkeeping
    * dropped.
    */
  def snapshotView(versioned: DataFrame): DataFrame =
    versioned.where(!col("__deleted")).drop("__seq", "__deleted")

  /** Merge audit: per-action row counts for a changeset application —
    * inserted / updated / deleted / unchanged — the reconciliation
    * line a nightly refresh logs (and alerts on: a `deleted` spike
    * means the upstream feed truncated). Same two exchanges as
    * [[applyChangeSet]]; the classification is a projection over the
    * same full-outer join.
    */
  def changeSetSummary(base: DataFrame, changes: DataFrame, id: String,
                       seq: String = "seq", op: String = "op"): DataFrame = {
    val latest0 = latestChangePerKey(changes, id, seq)
      .select(col(id), col(op).as("__op"))
    val b = base.select(col(id)).withColumn("__in_base", lit(1))
    val c = latest0.withColumn("__in_chg", lit(1))
    b.join(c, Seq(id), "full_outer")
      .select(
        when(col("__in_chg").isNull, lit("unchanged"))
          .when(col("__op") === "delete",
            when(col("__in_base").isNull, lit("delete_noop"))
              .otherwise(lit("deleted")))
          .when(col("__in_base").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("action"))
      .groupBy(col("action")).agg(count(lit(1)).as("n"))
  }
}
