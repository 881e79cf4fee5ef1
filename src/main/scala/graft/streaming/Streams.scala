package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.pipelines.JhubPipeline

/** Structured Streaming extension (SURVEY §7.4): the reference's
  * incrementality is calendar-batch (previous-hour globs,
  * jhub_proc.py:268-276); the natural Spark-first upgrade is a file
  * stream with checkpointed source tracking — same transform, the
  * engine's file-source log replaces the manual hour masks.
  */
object Streams {

  /** Streaming variant of the jhub pipeline: watch `inputDir` for new
    * fluent-bit JSON, apply the SAME batch transform (the lineage is
    * identical — one definition serves both modes), write parquet with
    * exactly-once file-sink semantics.
    *
    * `Trigger.AvailableNow` drains everything present then stops — the
    * scheduled-batch replacement; pass a processing-time trigger for a
    * long-running daemon.
    */
  def jhubStream(spark: SparkSession, inputDir: String, schema: StructType,
                 outDir: String, checkpointDir: String,
                 trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] = {
    val raw = spark.readStream.schema(schema).json(inputDir)
    JhubPipeline.transform(raw)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
  }

  /** Watermarked tumbling-window event counts — the streaming twin of the
    * q_events_hourly batch query: 1-hour windows, late data admitted up
    * to `lateness`, per-window per-type counts and exact decimal value
    * sums. Works on any streaming DataFrame with (ts, event_type, value).
    */
  def eventCountsHourly(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("event_hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** One micro-batch through the contract dual-sink: record the result
    * under `<table>#<batchId>` for the report, but RETHROW on failure —
    * a swallowed exception would let the engine commit the batch's
    * offsets, permanently skipping its rows; failing the query instead
    * leaves the checkpoint at the failed batch, so a restart replays it
    * (append-mode re-run, the reference's idempotency model).
    *
    * The failure check is on THIS attempt's outcome (a local capture),
    * never a scan of `ctx.report`: a replay re-runs the batch under the
    * SAME stage name, and a report scan would find the previous
    * attempt's recorded Left first — the retry could then never
    * succeed, re-appending its rows on every attempt while the
    * checkpoint stayed stuck.
    */
  private def saveBatchOrFail(ctx: graft.pipelines.PipelineContext,
      contract: graft.sinks.Contract,
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long,
      loadDate: Option[java.sql.Date]): Unit = {
    var failure: Option[Throwable] = None
    ctx.stage(s"${contract.table}#$batchId") {
      try ctx.saveTable(batch, contract,
        modeOverride = Some(org.apache.spark.sql.SaveMode.Append),
        loadDate = loadDate)
      catch { case e: Throwable => failure = Some(e); throw e }
    }
    failure.foreach { e =>
      throw new IllegalStateException(
        s"dual-sink batch $batchId failed; failing the query so the " +
          "checkpoint does not advance past it", e)
    }
  }

  /** Streaming ingestion through the SAME dual-sink contract machinery as
    * the batch pipelines: each micro-batch goes through
    * [[graft.pipelines.PipelineContext.saveTable]] — contract projection,
    * serving DDL, parquet staging + JDBC write, reconciliation — in
    * append mode (the only sane streaming mode for an accumulating
    * table). Checkpointing makes the SOURCE exactly-once; the sinks are
    * effectively-once per batch like any foreachBatch writer, which
    * matches the reference's append-mode daily-load idempotency model
    * (re-running a failed batch re-appends — same behavior its calendar
    * batches have, SURVEY §2.10 O5).
    *
    * `loadDate` stamps/partitions staging exactly like the batch path, so
    * a streaming drain and a daily batch land in the same layout.
    */
  def dualSinkStream(stream: DataFrame, ctx: graft.pipelines.PipelineContext,
                     contract: graft.sinks.Contract, checkpointDir: String,
                     loadDate: Option[java.sql.Date] = None,
                     trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        saveBatchOrFail(ctx, contract, batch, batchId, loadDate)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** The reference's hourly-incremental production cadence composed as
    * ONE path (jhub_proc.py:268-276: process the latest hour partition,
    * append into the dated staging table): each micro-batch lands
    * through the contract dual-sink ([[dualSinkStream]] semantics
    * verbatim) AND appends its zone-stats slice ([[zoneStatsStream]]
    * semantics, bucket = the batch's `load_date` stamp) to
    * `storePath` — the stats writer moves WITH the table writer,
    * which is exactly the freshness contract
    * [[graft.plans.ZoneMapPruning]]'s soundness note demands of the
    * metadata attach paths. After (any number of) runs,
    * `ZoneMapPruning.attachFromStore(spark, stagingPath, "load_date",
    * storePath)` registers the staging table with a metadata read and
    * a DATA-column predicate prunes `load_date` directories.
    *
    * Ordering makes the composition safe: the slice is written only
    * AFTER the dual-sink stage succeeded — a failed batch rethrows
    * first ([[dualSinkStream]]'s checkpoint-holding contract), so the
    * replay re-runs BOTH halves; the replayed slice collapses
    * idempotently in the store view (per-(batch_id, bucket) replay
    * collapse) and the replayed data append is the reference's
    * append-mode idempotency model. Stats therefore never lead the
    * data, and a batch's rows are never served prunable before their
    * slice lands only in the window between the two writes of ITS OWN
    * batch — an attach in that window sees the store MISSING the
    * freshly written bucket only on day one (whole-bucket coverage
    * check fails loudly), or a box union that simply hasn't widened
    * yet; re-attach after the drain, as the daily cadence does.
    */
  def dualSinkZoneStatsStream(stream: DataFrame,
      ctx: graft.pipelines.PipelineContext, contract: graft.sinks.Contract,
      checkpointDir: String, loadDate: java.sql.Date, zoneDims: Seq[String],
      storePath: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        saveBatchOrFail(ctx, contract, batch, batchId, Some(loadDate))
        // slice over the CONTRACT-projected frame — the stats must
        // describe exactly what landed in staging, not the raw batch
        graft.operators.Layout.rawZoneMap(
            contract.select(batch.toDF()).withColumn("load_date",
              lit(loadDate)),
            col("load_date"), zoneDims)
          .withColumn("batch_id", lit(batchId))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(storePath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** Streaming incremental near-dedup — the streaming-native form of the
    * daily curation funnel
    * ([[graft.pipelines.CorpusPipeline.curateIncrement]]): each
    * micro-batch of raw (doc_id, text) documents is quality-gated,
    * deduped against itself AND against the accumulated signature store,
    * its survivors appended to `curatedPath` and their MinHash
    * signatures appended to `sigStorePath` — so the NEXT batch dedups
    * against everything kept so far, including earlier batches of this
    * same stream. The store is re-read each batch (fresh file listing),
    * and a batch's dedup cost is one banded equi-join against
    * signatures — accumulated text is never rescanned, which is what
    * makes the shape viable on an unbounded stream.
    *
    * Same effectively-once model as [[dualSinkStream]]: a failing batch
    * fails the query (foreachBatch exceptions propagate), so the
    * checkpoint cannot advance past dropped rows. Replay semantics are
    * append-mode: a batch that crashed AFTER both appends re-appends
    * nothing new on replay (its docs now match their own stored
    * signatures and are dropped — the first append stands); a batch
    * that crashed BETWEEN the curated append and the signature append
    * re-appends its curated rows (duplicates in `curatedPath`).
    * Signatures are deliberately appended last — the other order would
    * make a replayed batch's docs match their own signatures and never
    * land in `curatedPath` at all (data loss beats duplication is the
    * wrong trade). Downstream consumers wanting exactly-once should
    * exact-dedup on doc_id, which is one hash aggregate.
    */
  def incrementalDedupStream(docs: DataFrame, sigStorePath: String,
                             curatedPath: String, checkpointDir: String,
                             cfg: graft.pipelines.CorpusPipeline.Config =
                               graft.pipelines.CorpusPipeline.Config(),
                             trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val hPath = new org.apache.hadoop.fs.Path(sigStorePath)
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // empty-store bootstrap: derive the signature schema from an
        // empty slice of the batch instead of hand-declaring it
        val refSigs =
          if (fs.exists(hPath) &&
              fs.listStatus(hPath).exists(_.getPath.getName.endsWith(".parquet")))
            spark.read.parquet(sigStorePath)
          else graft.operators.Dedup.minhashSignatures(batch.toDF().limit(0),
            col("doc_id"), col("text"), cfg.numHashes, cfg.shingleSize)
        val (curated, keptSigs, persisted) =
          graft.pipelines.CorpusPipeline.curateIncrementManaged(
            batch.toDF(), refSigs, cfg)
        try {
          graft.sinks.ParquetSink.write(curated, curatedPath,
            org.apache.spark.sql.SaveMode.Append)
          // signatures append AFTER the curated write, to the same path
          // refSigs reads: refSigs snapshotted its file listing above, so
          // the new files don't feed back into this batch's own dedup —
          // and see the replay-semantics note for why this order
          graft.sinks.ParquetSink.write(keptSigs, sigStorePath,
            org.apache.spark.sql.SaveMode.Append)
        } finally {
          // free this batch's persisted intermediates via the DATASET
          // handles: unlike an RDD-level unpersist this also removes the
          // cache-manager plan entries, which would otherwise accumulate
          // per batch for the stream's lifetime and slow every cache
          // lookup
          persisted.foreach(_.unpersist(blocking = false))
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** Continuously maintain a MERGE-INTO snapshot store from a change
    * stream (id, seq, op, payload): each micro-batch folds through
    * [[graft.operators.Cdc.applyChangeSetVersioned]] — the upgrade
    * from "nightly cdc_merge job" to "always-fresh serving snapshot".
    *
    * The versioned store is what makes this safe under streaming
    * semantics: foreachBatch is at-least-once (a batch can REPLAY
    * after a crash), and replaying changes against the versioned
    * snapshot is a no-op because their seqs are no longer newer than
    * the store's — the idempotence the plain [[graft.operators
    * .Cdc.applyChangeSet]] cannot give across restarts. Cross-batch
    * ordering is likewise covered (stale stragglers in a later batch
    * lose to the stored seq; tombstones block resurrections).
    *
    * Store layout: generation directories + a CURRENT pointer file —
    * the store can't be overwritten in place while its own files back
    * the batch's base frame, and a crash between writes must never
    * lose the last committed generation. Generation numbers are a
    * per-STORE monotone counter (successor of CURRENT's generation),
    * never the stream's batch id: batch ids restart at 0 with every
    * fresh checkpoint, and a gen name derived from them collides
    * across checkpoint lifetimes — the original design's failure mode,
    * where a new stream's batch 0 either overwrote gen-0 or was
    * silently skipped as a "replay". The new generation is fully
    * written BEFORE the pointer moves (a torn run leaves an orphan
    * gen dir, never a broken store).
    *
    * Crash recovery, the full matrix:
    *   - crash after the gen write, before the pointer swap → orphan
    *     gen dir; CURRENT still names the previous generation; replay
    *     folds onto it and writes the NEXT number (the orphan is GC'd);
    *   - crash between `delete(CURRENT)` and `rename(tmp, CURRENT)` —
    *     the torn swap — leaves no CURRENT but a fully-written
    *     CURRENT.tmp (it is created and closed before the delete):
    *     the next batch COMPLETES the swap (rename tmp into place) and
    *     proceeds from it; readers ([[cdcStoreView]]) fall back to the
    *     tmp without mutating. Bootstrapping an empty base instead
    *     would silently drop the accumulated store;
    *   - no CURRENT, no CURRENT.tmp, but gen-* dirs present → the
    *     store is corrupt in a way no automatic choice can repair
    *     (which generation is live?); the batch FAILS loudly instead
    *     of starting over empty;
    *   - nothing at all → genuine bootstrap from the change stream's
    *     own schema.
    *
    * Replay semantics: CURRENT records, besides the gen name, the
    * identity of the batch that committed it (a per-writer epoch +
    * the batch id). A batch whose identity matches CURRENT already
    * applied — only the stream's checkpoint commit was lost — and is
    * skipped: proceeding would read base FROM that generation while
    * Overwrite-writing the fold back TO it, deleting the very files
    * the lazy base scan needs. A replay from a DIFFERENT writer epoch
    * (same-checkpoint restart, or a fresh checkpoint re-feeding old
    * data) is indistinguishable from new data by name — it re-applies,
    * which the versioned fold makes a semantic no-op (stale seqs are
    * shielded), and writes a fresh generation number, so the
    * self-overwrite hazard cannot recur. (A plain `return` in
    * foreachBatch would be a non-local return — a thrown
    * NonLocalReturnControl that FAILS the batch — hence the guard
    * shape below.)
    *
    * GC keeps the newest `keepGenerations` generations (the live one
    * included; default 2 = live + its immediate predecessor) and
    * deletes older ones: a reader that resolved CURRENT just before a
    * concurrent swap still has every file of its snapshot on disk for
    * a full batch interval, and [[readGeneration]] /
    * [[generationDiff]] can time-travel `keepGenerations − 1` steps
    * back — raise it to make "diff me against last week" survive the
    * GC policy (retention is generations × batch cadence of history,
    * priced in snapshots on disk). The floor is 2: retaining only the
    * live generation would delete the snapshot a concurrent reader
    * just resolved. This is the two-phase shape every table format
    * uses (manifest-then-data, retained-snapshot GC); at 100 TB you'd
    * swap this writer for MERGE INTO on a transactional table and
    * keep the same versioned-fold semantics upstream.
    */
  def cdcMergeStream(changes: DataFrame, storePath: String,
                     checkpointDir: String, id: String,
                     seq: String = "seq", op: String = "op",
                     trigger: Trigger = Trigger.AvailableNow(),
                     generationFiles: Option[Int] = None,
                     keepGenerations: Int = 2): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(keepGenerations >= 2,
      s"keepGenerations must be >= 2 (live + superseded — retaining " +
        s"only the live generation would delete the snapshot a " +
        s"concurrent reader just resolved), got $keepGenerations")
    // writer epoch: one per cdcMergeStream CALL, so it changes on every
    // restart (like the engine's runId) but is stable across batches of
    // one run — exactly the scope a same-run redelivery shares
    val writerEpoch = java.util.UUID.randomUUID().toString.take(8)
    changes.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(storePath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val current = new org.apache.hadoop.fs.Path(root, "CURRENT")
        val tmp = new org.apache.hadoop.fs.Path(root, "CURRENT.tmp")
        // resolve the committed pointer, completing a torn swap if one
        // is in flight (no CURRENT, fully-written CURRENT.tmp)
        if (!fs.exists(current) && fs.exists(tmp)) fs.rename(tmp, current)
        val pointer: Option[(String, String)] =
          if (fs.exists(current)) {
            val in = fs.open(current)
            val lines =
              try new String(org.apache.commons.io.IOUtils.toByteArray(in),
                java.nio.charset.StandardCharsets.UTF_8).split("\n").toSeq
              finally in.close()
            Some((lines.head.trim, lines.drop(1).headOption.getOrElse("").trim))
          } else None
        val existingGens = listGenerations(fs, root)
        require(pointer.nonEmpty || existingGens.isEmpty,
          s"cdc store $storePath has generation dirs " +
            s"(${existingGens.mkString(",")}) but no CURRENT pointer — " +
            "refusing to bootstrap an empty base over an existing store")
        val identity = s"$writerEpoch:$batchId"
        if (!pointer.exists(_._2 == identity)) {
          val base = pointer match {
            case Some((g, _)) =>
              spark.read.parquet(
                new org.apache.hadoop.fs.Path(root, g).toString)
            case None =>
              // bootstrap: empty versioned store with the payload schema
              // derived from the change stream itself
              graft.operators.Cdc.versionSnapshot(
                batch.toDF().drop(seq, op).limit(0))
          }
          // successor of the highest generation on disk, not CURRENT's
          // (an orphan gen from a torn run may outrank CURRENT; writing
          // over it with Overwrite would also be fine, but skipping its
          // number keeps "gen number = commit order" readable)
          val genName = f"gen-${
            existingGens.lastOption.map(genNumber).getOrElse(0L) + 1}%012d"
          val next0 = graft.operators.Cdc.applyChangeSetVersioned(
            base, batch.toDF(), id, seq, op)
          // generationFiles: every batch REWRITES the store, so the
          // merge's shuffle parallelism would otherwise dictate the
          // file count of even a tiny snapshot forever (the small-file
          // problem inside our own store). The coalesce adds no
          // exchange — it concatenates the join's partitions, the same
          // shuffle-free bin-packing Maintenance.compactTable uses.
          // Leave None when the snapshot is genuinely large: natural
          // partitioning IS the parallelism of the next batch's scan.
          val next = generationFiles.map(next0.coalesce).getOrElse(next0)
          next.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(new org.apache.hadoop.fs.Path(root, genName).toString)
          // pointer swap: write CURRENT.tmp fully, then rename into place
          // (delete-then-rename of the tiny pointer — the data itself is
          // never in the window, and CURRENT.tmp survives a torn swap)
          val outS = fs.create(tmp, true)
          try outS.write(s"$genName\n$identity".getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally outS.close()
          if (fs.exists(current)) fs.delete(current, false)
          fs.rename(tmp, current)
          // GC: keep the newest keepGenerations generations (numbers
          // are the per-store monotone counter, so newest-by-name is
          // newest-by-commit), plus — belt and braces for a torn-run
          // orphan ranking above CURRENT — the generation the pointer
          // named; delete everything older
          val gens = listGenerations(fs, root)
          val keep = gens.takeRight(keepGenerations).toSet +
            genName ++ pointer.map(_._1)
          gens.filterNot(keep).foreach { g =>
            fs.delete(new org.apache.hadoop.fs.Path(root, g), true)
          }
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
  }

  private def genNumber(genName: String): Long =
    genName.stripPrefix("gen-").toLong

  private def listGenerations(fs: org.apache.hadoop.fs.FileSystem,
                              root: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.matches("gen-\\d{12}")).toSeq.sorted

  /** The generation names currently on disk under a [[cdcMergeStream]]
    * store, oldest first — with the keep-N-1 GC at most the live
    * generation and its predecessor (plus a not-yet-GC'd orphan from a
    * torn run).
    */
  def listGenerations(spark: SparkSession, storePath: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    listGenerations(root.getFileSystem(
      spark.sparkContext.hadoopConfiguration), root)
  }

  /** Time travel: the VERSIONED frame of one named generation (as
    * [[graft.operators.Cdc.applyChangeSetVersioned]] wrote it —
    * project through [[graft.operators.Cdc.snapshotView]] for the live
    * rows). With keep-N-1 GC the previous generation is always
    * readable; older ones only until their GC.
    */
  def readGeneration(spark: SparkSession, storePath: String,
                     genName: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root, genName)
    require(fs.exists(dir),
      s"generation $genName not on disk under $storePath " +
        s"(have: ${listGenerations(fs, root).mkString(",")})")
    spark.read.parquet(dir.toString)
  }

  /** What changed between two generations of a [[cdcMergeStream]]
    * store, as a [[graft.operators.Snapshot.diff]] classification of
    * the LIVE views (added / removed / changed / unchanged by the
    * given content column) — the "what did last night's fold actually
    * touch" audit, and the incremental-reprocessing driver ("recompute
    * only the changed ids"). Both sides are one parquet scan; the diff
    * is one full-outer join keyed on id.
    */
  def generationDiff(spark: SparkSession, storePath: String,
                     fromGen: String, toGen: String,
                     id: Column, content: Column): DataFrame =
    graft.operators.Snapshot.diff(
      graft.operators.Cdc.snapshotView(readGeneration(spark, storePath, fromGen)),
      graft.operators.Cdc.snapshotView(readGeneration(spark, storePath, toGen)),
      id, content)

  /** Continuously maintain layout statistics: each micro-batch computes
    * its OWN zone map ([[graft.operators.Layout.zoneMap]] — one
    * map-side agg over just the new rows) and APPENDS it to the store;
    * the served zone map is [[graft.operators.Layout.mergeZoneMaps]]
    * over the appended slices, which the merge algebra makes EXACT
    * (min/max/sum are associative-commutative — zorder_zonemap
    * _incremental's in-plan identity). Append-only, so no pointer
    * dance is needed ([[cdcMergeStream]] swaps because its store is
    * replaced; this one only grows) and replay of a batch merely
    * appends a duplicate slice — min/max absorb it, only n_rows would
    * double-count, which is why the slice carries the batch id: the
    * reader deduplicates per (batch_id, bucket), making the view
    * replay-proof too.
    *
    * `x`/`y` must be the NORMALIZED curve inputs with bounds fixed at
    * stream start ([[graft.operators.Layout.normalize16]] with a
    * constant max): an unbounded stream cannot re-derive its domain
    * per batch without the bucket boundaries drifting between slices.
    */
  def zoneMapStream(rows: DataFrame, x: Column, y: Column,
                    bucketBits: Int, storePath: String,
                    checkpointDir: String,
                    trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Layout.zoneMap(batch.toDF(), x, y, bucketBits)
          .withColumn("batch_id", lit(batchId))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(storePath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** The RAW-stats twin of [[zoneMapStream]], feeding the optimizer
    * rule instead of the pruning-stats arithmetic: each micro-batch
    * computes its own [[graft.operators.Layout.rawZoneMap]] slice
    * (per-bucket raw min/max of the registered columns — integral or
    * string — one map-side agg over just the new rows) and APPENDS it
    * stamped with the batch id. The served stats are [[zoneStatsView]]
    * (replay-collapse + box-union merge, exact by the same
    * associative-commutative algebra), and
    * [[graft.plans.ZoneMapPruning.attachFromStore]] registers a scan
    * for pruning straight from this store — a bucket-bounded metadata
    * read, never a rescan of the table the stats describe.
    *
    * `bucket` must be the same pure projection the table's layout
    * writer used (stable across batches); replay of a batch appends a
    * duplicate slice that min/max absorb, with n_rows deduplicated per
    * (batch_id, bucket) by the view.
    */
  def zoneStatsStream(rows: DataFrame, bucket: Column, dims: Seq[String],
                      storePath: String, checkpointDir: String,
                      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Layout.rawZoneMap(batch.toDF(), bucket, dims)
          .withColumn("batch_id", lit(batchId))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(storePath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** The pruning-ready stats a [[zoneStatsStream]] store currently
    * serves: replay-collapse per (batch_id, bucket) — min/max are
    * idempotent over a replayed identical slice, n_rows needs the max
    * — then the box-union fold across batches
    * ([[graft.operators.Layout.mergeRawZoneMaps]]). Identical to
    * rebuilding the raw zone map from all rows ever streamed.
    * Dimensions are inferred from the store's `min_`/`max_` columns.
    */
  /** Flat-store read shared by the serving views: crash-consistent
    * against an interrupted [[graft.operators.Maintenance.compactStore]]
    * — when a compaction manifest is present the pre-compaction file
    * set is read instead of the (possibly partial) directory, without
    * mutating the store (recovery stays the writer's job; see
    * [[graft.operators.Maintenance.consistentStoreFiles]]).
    */
  private def readStore(spark: SparkSession, storePath: String,
                        retries: Int = 3): DataFrame =
    graft.operators.Maintenance.consistentStoreFiles(spark, storePath) match {
      case Some(files) =>
        // a LIVE compaction can race this read's footer pass two ways,
        // and an FNFE does NOT distinguish them by itself: (a) the
        // compaction COMMITTED (manifest deleted, parked files vanished)
        // — the directory is consistent again and the plain read is
        // right; (b) the compaction PARKED a file this listing saw as
        // live — the manifest is still present and a plain directory
        // read would silently serve a mid-compaction partial store
        // (zone boxes narrow, pruning drops rows). Arbitration is the
        // manifest itself: fnfeFallback re-derives from a fresh
        // consistent listing while the manifest persists and only
        // falls back to the plain read once it is confirmed absent.
        // Scope, stated honestly: the guard covers the CONSTRUCTION-time
        // footer read; a view held across the commit can still fail at
        // ACTION time if the engine re-lists — the same tiny
        // reader-vs-live-rename window consistentStoreFiles has always
        // documented, for which the remedy is re-deriving the view
        try spark.read.parquet(files: _*)
        catch { case e: java.io.FileNotFoundException =>
          fnfeFallback(spark, storePath, retries, e)(
            readStore(spark, storePath, retries - 1))
        }
      case None => spark.read.parquet(storePath)
    }

  /** FNFE arbitration for the serving views' footer pass (see
    * [[readStore]]): plain directory read ONLY when the compaction
    * manifest is confirmed absent (post-commit — the store is whole
    * again); while the manifest persists (park phase of a live
    * compactStore) re-derive from a fresh consistent listing, and if
    * retries exhaust with the manifest still there, fail LOUDLY rather
    * than serve a silently partial store view.
    */
  private def fnfeFallback(spark: SparkSession, storePath: String,
                           retries: Int,
                           cause: java.io.FileNotFoundException)
                          (retry: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest =
      new org.apache.hadoop.fs.Path(storePath + ".__compact_manifest")
    if (!fs.exists(manifest)) spark.read.parquet(storePath)
    else if (retries > 0) retry
    else throw new java.io.FileNotFoundException(
      s"store $storePath: listed files kept vanishing while a compaction " +
        "manifest is present (live compaction park race, retries " +
        "exhausted) — refusing the plain directory read, which would " +
        s"serve a partial mid-compaction store: ${cause.getMessage}")
  }

  def zoneStatsView(spark: SparkSession, storePath: String): DataFrame = {
    val df = readStore(spark, storePath)
    val dims = df.columns.filter(_.startsWith("min_"))
      .map(_.stripPrefix("min_")).toSeq
      .filter(c => df.columns.contains(s"max_$c"))
    val collapsed = dims.flatMap { c =>
      Seq(min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"))
    } :+ max(col("n_rows")).as("n_rows")
    graft.operators.Layout.mergeRawZoneMaps(dims)(
      df.groupBy(col("batch_id"), col("bucket"))
        .agg(collapsed.head, collapsed.tail: _*)
        .drop("batch_id"))
  }

  /** Continuously maintain per-group distinct counts: each micro-batch
    * appends its OWN constant-size HLL sketch rows
    * ([[graft.operators.Cardinality.sliceSketches]] keyed by the batch
    * id) and the served view folds the store by register-max union —
    * the cardinality twin of [[zoneMapStream]]: append-only, history
    * never rescanned, replay-proof. Replay safety needs no dedup at
    * all for the sketch itself (a sketch's registers are the max over
    * the batch's value hashes, so a replayed duplicate unions to the
    * identical registers — union is idempotent); only the row COUNT
    * would double-count, which is why the view folds n_rows with max
    * per (batch_id, group) before summing.
    */
  def cardinalityStream(rows: DataFrame, group: Column, value: Column,
                        lgK: Int, storePath: String, checkpointDir: String,
                        trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Cardinality.sliceSketches(
            batch.toDF(), lit(batchId).as("batch_id"), group, value, lgK)
          .withColumnRenamed("slice", "batch_id")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(storePath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** Continuously maintain the volume-monitoring count store behind
    * [[graft.operators.Anomaly]]: each micro-batch collapses to its
    * own `(group, bucket, cnt)` partial counts (one map-side agg —
    * slice size is bounded by groups × buckets TOUCHED by the batch,
    * not by batch rows), stamped with the batch id and appended. The
    * served view ([[anomalyStoreView]]) folds replayed duplicate
    * appendixes with max per (batch_id, group, bucket) — a replay
    * rewrites the identical partial, so max is exact — then sums
    * partials across batches into the total series and runs the
    * detector. Late events for an old bucket are NOT a special case:
    * their batch appends another partial for that bucket and the sum
    * absorbs it — the monitor's verdict converges to the batch
    * recompute for every arrival order.
    */
  def anomalyStream(rows: DataFrame, group: Column, bucket: Column,
                    storePath: String, checkpointDir: String,
                    trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Anomaly.countSeries(batch.toDF(), group, bucket)
          .withColumn("batch_id", lit(batchId))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(storePath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** The monitoring verdict an [[anomalyStream]] store currently
    * serves: replay-collapse, cross-batch sum, then the median/MAD
    * detector — identical output to running
    * [[graft.operators.Anomaly.robustCountAnomalies]] over all events
    * ever streamed.
    */
  def anomalyStoreView(spark: SparkSession, storePath: String,
                       thresh: Double = 3.0): DataFrame =
    graft.operators.Anomaly.robustCountAnomaliesFromSeries(
      readStore(spark, storePath)
        .groupBy(col("batch_id"), col("group"), col("bucket"))
        .agg(max(col("cnt")).as("cnt"))
        .groupBy(col("group"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt")),
      thresh)

  /** Continuously maintain a file-level Bloom index
    * ([[graft.operators.BloomIndex]]): each micro-batch builds the
    * `(chunk, word, bitmap)` rows for ITS rows and appends. The view
    * folds everything with `bit_or` per (chunk, word) — OR is
    * idempotent, so this loop needs NO replay bookkeeping at all: a
    * replayed batch re-appends the identical bit rows and the fold
    * absorbs them; late rows for an old chunk OR into it. The
    * simplest replay story in the streaming family, bought entirely
    * by the index's merge algebra.
    */
  def bloomIndexStream(rows: DataFrame, chunk: Column, key: Column,
                       k: Int, mBits: Int, storePath: String,
                       checkpointDir: String,
                       trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.BloomIndex.build(batch.toDF(), chunk, key, k, mBits)
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(storePath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** The probe-ready index a [[bloomIndexStream]] store currently
    * serves: one `bit_or` fold per (chunk, word) — identical to
    * rebuilding from all rows ever streamed.
    */
  def bloomIndexView(spark: SparkSession, storePath: String): DataFrame =
    readStore(spark, storePath)
      .groupBy(col("chunk"), col("word"))
      .agg(org.apache.spark.sql.functions.bit_or(col("bitmap")).as("bitmap"))

  /** The CUSUM level-shift verdict over the same [[anomalyStream]]
    * store — one store, both detectors (point spikes via
    * [[anomalyStoreView]], sustained shifts here), same replay
    * collapse.
    */
  def driftStoreView(spark: SparkSession, storePath: String,
                     slack: Double = 0.5, h: Double = 5.0): DataFrame =
    graft.operators.Anomaly.cusumDriftFromSeries(
      readStore(spark, storePath)
        .groupBy(col("batch_id"), col("group"), col("bucket"))
        .agg(max(col("cnt")).as("cnt"))
        .groupBy(col("group"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt")),
      slack, h)

  /** Continuously maintain an IVF vector index: each micro-batch of
    * (id, embedding) rows is assigned to its nearest centroid — a pure
    * per-row codegen kernel over the broadcast model, ZERO shuffle —
    * and appended to the store PARTITIONED BY `list_id`, so a query's
    * probe of nprobe lists reads nprobe/nlist of the index directories
    * and the accumulated index is never rescanned or refit per batch.
    * This is the vector-index twin of [[incrementalDedupStream]]'s
    * signature store: the model (an nlist×dim matrix) is fit ONCE
    * ([[graft.operators.Ivf.fitDistributed]] for the bit-stable form)
    * and must stay FIXED for the life of the store — re-fitting would
    * silently re-route new vectors to lists old ones were filed under
    * (rebuild into a fresh store to re-center; the standard IVF
    * operating model).
    *
    * Replay semantics: append-only, same as [[zoneMapStream]] — a
    * replayed batch re-appends its slice verbatim (stamped with the
    * same batch id). No view-side dedup is needed for the store
    * itself; the probe path collapses duplicates AFTER candidate
    * pruning ([[graft.operators.Ivf.topKStored]]), which keeps the
    * dedup candidate-sized and the partition-pruned scan intact.
    * Contract: `id` values are unique across the stream's life (an
    * append-only corpus); route vector UPDATES through a CDC store
    * instead — an updated vector may belong to a DIFFERENT list, so
    * latest-wins cannot be resolved inside one list's partition.
    */
  def ivfIndexStream(vectors: DataFrame, model: graft.operators.Ivf.IvfModel,
                     storePath: String, checkpointDir: String,
                     id: Column, vec: Column,
                     trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Ivf.assign(model, batch.toDF(), id, vec)
          .withColumn("batch_id", lit(batchId))
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .partitionBy("list_id")
          .parquet(storePath)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)

  /** The raw assigned-vector frame an [[ivfIndexStream]] store
    * currently serves — `(vec_id, v, batch_id, list_id)`, list_id a
    * partition column so a static or dynamic list filter prunes
    * directories (PlanAuditSpec pins the PartitionFilters). Feed it to
    * [[graft.operators.Ivf.topKStored]], which also absorbs replayed
    * duplicate appendixes; do NOT hand it to plain `topK`, which
    * assumes a dedup'd assignment.
    */
  def ivfIndexView(spark: SparkSession, storePath: String): DataFrame =
    ivfIndexViewWithRetry(spark, storePath, retries = 3)

  private def ivfIndexViewWithRetry(spark: SparkSession, storePath: String,
                                    retries: Int): DataFrame =
    graft.operators.Maintenance.consistentStoreFiles(spark, storePath) match {
      // crashed-compaction window: read the pre-compaction file set.
      // The set can span TWO roots — files still in the store and files
      // already parked under <store>.__compact_parked (same list_id=
      // leaf layout) — and Spark's partition discovery rejects one read
      // over two base paths ("conflicting directory structures"), so
      // each root is read under its OWN basePath (keeping list_id a
      // partition column) and the halves union
      case Some(files) =>
        val p = new org.apache.hadoop.fs.Path(storePath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val base = fs.makeQualified(p).toString
        val parkedBase = base + ".__compact_parked"
        val (parked, live) = files.partition(_.startsWith(parkedBase + "/"))
        def read(group: Seq[String], b: String) =
          spark.read.option("basePath", b).parquet(group: _*)
        // same commit race as readStore, same arbitration: a vanished
        // file only licenses the plain directory read once the manifest
        // is confirmed absent (commit happened); while it persists,
        // re-derive from a fresh consistent listing (fnfeFallback).
        // Same construction-time scope note as readStore: an
        // already-built view crossing the commit can still fail at
        // action time (re-derive it)
        try (live.nonEmpty, parked.nonEmpty) match {
          case (true, true) =>
            read(live, base).unionByName(read(parked, parkedBase))
          case (true, false) => read(live, base)
          case _             => read(parked, parkedBase)
        } catch { case e: java.io.FileNotFoundException =>
          fnfeFallback(spark, storePath, retries, e)(
            ivfIndexViewWithRetry(spark, storePath, retries - 1))
        }
      case None => spark.read.parquet(storePath)
    }

  /** The per-group distinct view a [[cardinalityStream]] store
    * currently serves: replayed appendixes collapse (idempotent sketch
    * union + max n_rows per batch slice), then one store-row-sized
    * merge. Output: (group, n_distinct, n_rows, n_slices).
    */
  def cardinalityStoreView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Cardinality.mergeSliceSketches(
      readStore(spark, storePath)
        .groupBy(col("batch_id"), col("group"))
        .agg(org.apache.spark.sql.functions.hll_union_agg(col("sketch"))
            .as("sketch"),
          max(col("n_rows")).as("n_rows"))
        .drop("batch_id"))
      .drop("sketch")

  /** The zone map a [[zoneMapStream]] store currently serves: slices
    * deduplicated per (batch_id, bucket) — a replayed batch's
    * duplicate appendix collapses — then folded by the merge algebra.
    */
  def zoneMapStoreView(spark: SparkSession, storePath: String): DataFrame =
    graft.operators.Layout.mergeZoneMaps(
      readStore(spark, storePath)
        .groupBy(col("batch_id"), col("bucket"))
        .agg(min(col("min_x")).as("min_x"), max(col("max_x")).as("max_x"),
          min(col("min_y")).as("min_y"), max(col("max_y")).as("max_y"),
          max(col("n_rows")).as("n_rows"))
        .drop("batch_id"))

  /** Read the live snapshot a [[cdcMergeStream]] store currently
    * serves (resolve CURRENT, project the live rows). Falls back to a
    * fully-written CURRENT.tmp when CURRENT is missing — the torn-swap
    * window — WITHOUT mutating the store (completing the swap is the
    * writer's job; a reader must stay read-only).
    *
    * Concurrency contract: the pointer is resolved eagerly but the
    * generation's files are scanned lazily, so materialize the view
    * promptly. The writer's keep-N-1 GC guarantees the resolved
    * generation's files survive at least one further batch commit — a
    * view is safe across ONE concurrent swap, not an unbounded backlog
    * (pin a longer retention by reading [[readGeneration]] output into
    * a persisted frame if you need a long-lived handle).
    */
  def cdcStoreView(spark: SparkSession, storePath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = new org.apache.hadoop.fs.Path(root, "CURRENT")
    val tmp = new org.apache.hadoop.fs.Path(root, "CURRENT.tmp")
    val pointer =
      if (fs.exists(current)) current
      else if (fs.exists(tmp)) tmp
      else throw new IllegalArgumentException(
        s"no CURRENT pointer (or in-flight CURRENT.tmp) under $storePath")
    val in = fs.open(pointer)
    val gen =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").head.trim
      finally in.close()
    graft.operators.Cdc.snapshotView(
      spark.read.parquet(new org.apache.hadoop.fs.Path(root, gen).toString))
  }

  /** Stream-static enrichment: join each micro-batch against a dimension
    * DataFrame, broadcast by default — the dimension is the small side by
    * construction, and broadcasting keeps the stream side shuffle-free,
    * which is the only sane shape for an unbounded stream.
    *
    * Dimension freshness caveat: a plain `spark.read.parquet(path)`
    * DataFrame snapshots its FILE LISTING at creation, so files appended
    * to the path later are NOT picked up between batches. For a slowly-
    * changing dimension use a catalog table (`spark.table`, re-resolved
    * per batch) or rebuild the dimension inside a foreachBatch writer.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame, keys: Seq[String],
                   joinType: String = "left",
                   broadcastDim: Boolean = true): DataFrame =
    stream.join(if (broadcastDim) broadcast(dim) else dim, keys, joinType)

  /** Watermarked stream-stream inner join (the attribution shape: right
    * events joined to the left event they follow within `maxDelay`).
    * Both sides buffer in state; the TIME-BOUND condition + watermarks
    * are what let the engine evict state — an unconstrained stream-stream
    * join grows state forever, so the bound is mandatory here, not an
    * option. Key columns must be distinctly named per side (pre-alias).
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       keyLeft: String, keyRight: String,
                       tsLeft: String, tsRight: String,
                       maxDelay: String = "1 hour",
                       lateness: String = "10 minutes"): DataFrame =
    left.withWatermark(tsLeft, lateness)
      .join(right.withWatermark(tsRight, lateness),
        col(keyLeft) === col(keyRight) &&
          col(tsRight) >= col(tsLeft) &&
          col(tsRight) <= col(tsLeft) + expr(s"INTERVAL $maxDelay"))

  // --- stateful sessionization -----------------------------------------

  case class SessionEvent(user_id: Long, ts: Timestamp)
  case class SessionAcc(startMs: Long, lastMs: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  /** Streaming gap-based sessionization via flatMapGroupsWithState: one
    * open session per user in state; an event beyond `gapSeconds` of the
    * previous one closes and emits the session; the event-time timeout
    * (watermark past last + gap) flushes sessions of idle users. The
    * streaming twin of [[graft.operators.Sessionize.sessions]].
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapSeconds: Long,
                       lateness: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def close(user: Long, s: SessionAcc): SessionOut =
      SessionOut(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)

    def fn(user: Long, batch: Iterator[SessionEvent],
           state: GroupState[SessionAcc]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(user, _)).iterator
        state.remove()
        out
      } else {
        val out = Seq.newBuilder[SessionOut]
        var acc = state.getOption
        batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          acc match {
            case Some(s) if t - s.lastMs <= gapMs =>
              acc = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
            case Some(s) =>
              out += close(user, s)
              acc = Some(SessionAcc(t, t, 1))
            case None =>
              acc = Some(SessionAcc(t, t, 1))
          }
        }
        acc.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  // --- stateful funnel tracking -----------------------------------------

  case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

  /** Per-user funnel state: `applied` is the greedy-earliest chain
    * folded from FINALIZED events (ts already behind the watermark —
    * no earlier event can still arrive for them); `pending` buffers
    * step events still inside the lateness window as (tsMs, stepIdx)
    * pairs, folded in event-time order once the watermark passes them.
    */
  case class FunnelBuf(applied: List[Long], pending: List[(Long, Int)])
  case class FunnelOut(user_id: Long, n_steps: Int, t_first: Timestamp,
                       t_last: Timestamp, completed: Boolean)

  /** Streaming ordered-funnel tracking via flatMapGroupsWithState — the
    * streaming twin of [[graft.operators.EventAnalytics.funnelTimes]]:
    * per-user state is the greedy-earliest step chain; an event
    * advances the funnel iff it is the NEXT step and strictly after
    * the last reached one. The event-time timeout flushes a
    * `completed = false` row for users idle past `idleFlushSeconds`,
    * giving downstream a drop-off-by-stage signal without waiting for
    * the stream to end.
    *
    * ORDERING CONTRACT — equal to the batch operator for EVERY arrival
    * order within the watermark bound: step events are buffered in
    * state while their event time is still inside the lateness window
    * and folded into the chain in EVENT-TIME order only once the
    * watermark passes them (at which point no earlier event can still
    * arrive — the engine drops rows behind the watermark). So a step-1
    * event arriving a micro-batch AFTER a later step-2 event still
    * completes the funnel, exactly as the batch form would. The price
    * is latency, not correctness: a completion emits when the
    * watermark passes its last event (≤ `lateness` of event time
    * behind the live edge), not in the arrival micro-batch. Ties on
    * ts fold by step position (earlier funnel stage first) — the same
    * replay-stable rule the batch sort uses.
    *
    * State bound: `applied` is ≤ steps longs; `pending` holds only
    * STEP-TYPED events (off-funnel traffic is never buffered) whose
    * event time is within `lateness` of the watermark — bounded by the
    * user's step-event rate × lateness window, the standard stateful-
    * streaming bound (the stream-stream join buffers strictly more).
    */
  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
                   idleFlushSeconds: Long,
                   lateness: String = "10 minutes"): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"duplicate funnel steps: $steps")
    require(idleFlushSeconds > 0,
      s"idleFlushSeconds must be positive, got $idleFlushSeconds")
    import events.sparkSession.implicits._
    val idleMs = idleFlushSeconds * 1000L
    val nSteps = steps.size
    val stepPos = steps.zipWithIndex.toMap

    def out(user: Long, timesMs: List[Long], completed: Boolean): FunnelOut =
      FunnelOut(user, timesMs.size, new Timestamp(timesMs.head),
        new Timestamp(timesMs.last), completed)

    /** Fold every pending event the watermark has passed (strictly —
      * an event AT the watermark could still be joined by an equal-ts
      * peer) into the chain in (ts, step) order, emitting completions.
      */
    def foldFinal(user: Long, buf: FunnelBuf, wm: Long,
                  emitted: scala.collection.mutable.Builder[FunnelOut, Seq[FunnelOut]])
        : FunnelBuf = {
      val (fin, still) = buf.pending.partition(_._1 < wm)
      var applied = buf.applied
      fin.sorted.foreach { case (t, idx) =>
        if (applied.size < nSteps && idx == applied.size &&
            (applied.isEmpty || t > applied.last)) {
          applied = applied :+ t
          if (applied.size == nSteps) {
            emitted += out(user, applied, completed = true)
            applied = Nil // conversion done; a fresh funnel may start
          }
        }
      }
      FunnelBuf(applied, still)
    }

    /** Store `buf` and arm the timeout at the earliest actionable
      * instant: the oldest pending event (to fold it when the
      * watermark passes) or the idle-flush deadline — clamped past the
      * watermark, because a non-advancing batch can leave the desired
      * timeout BEHIND it and setTimeoutTimestamp throws on that (which
      * would kill the query on routine out-of-funnel traffic).
      */
    def park(state: GroupState[FunnelBuf], buf: FunnelBuf, wm: Long): Unit =
      if (buf.applied.isEmpty && buf.pending.isEmpty) state.remove()
      else {
        val targets = buf.pending.map(_._1) ++
          (if (buf.applied.nonEmpty && buf.pending.isEmpty)
             List(buf.applied.last + idleMs)
           else Nil)
        state.update(buf)
        state.setTimeoutTimestamp(math.max(targets.min, wm + 1L))
      }

    def fn(user: Long, batch: Iterator[FunnelEvent],
           state: GroupState[FunnelBuf]): Iterator[FunnelOut] = {
      val wm = state.getCurrentWatermarkMs()
      val emitted = Seq.newBuilder[FunnelOut]
      val prior = state.getOption.getOrElse(FunnelBuf(Nil, Nil))
      val incoming = if (state.hasTimedOut) Nil
        else batch.flatMap(e => stepPos.get(e.event_type)
          .map(idx => (e.ts.getTime, idx))).toList
      var buf = foldFinal(user,
        prior.copy(pending = prior.pending ++ incoming), wm, emitted)
      if (buf.pending.isEmpty && buf.applied.nonEmpty &&
          wm >= buf.applied.last + idleMs) {
        // genuinely idle: nothing can still arrive before the deadline
        emitted += out(user, buf.applied, completed = false)
        buf = FunnelBuf(Nil, Nil)
      }
      park(state, buf, wm)
      emitted.result().iterator
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Stateless quality gate for a document stream — the ingest-time
    * companion to [[graft.operators.Dedup.decontaminationGate]]: the
    * Gopher rule conjunction and the rational-logit score are pure
    * per-row projections ([[graft.operators.Quality.gopherKeepCol]] /
    * `logitScoreCol`), so they apply to a streaming frame unchanged —
    * no watermark, no state store, no shuffle; rejected documents never
    * reach the sink, and the surviving rows carry their score for
    * downstream threshold re-cuts. Works identically on a batch frame
    * (same plan), which is what the spec asserts.
    */
  def qualityGateStream(docs: DataFrame, text: Column,
                        minScore: Double = 0.5,
                        applyGopherRules: Boolean = true): DataFrame = {
    import graft.operators.Quality
    val scored = docs.withColumn("quality_score", Quality.logitScoreCol(text))
    val gated = scored.filter(col("quality_score") >= minScore)
    if (applyGopherRules) gated.filter(Quality.gopherKeepCol(text))
    else gated
  }
}
