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
        // record the per-batch result for the report, but RETHROW on
        // failure: a swallowed exception would let the engine commit the
        // batch's offsets, permanently skipping its rows. Failing the
        // query instead leaves the checkpoint at the failed batch, so a
        // restart replays it (append-mode re-run, the reference's
        // idempotency model).
        ctx.stage(s"${contract.table}#$batchId") {
          ctx.saveTable(batch, contract,
            modeOverride = Some(org.apache.spark.sql.SaveMode.Append),
            loadDate = loadDate)
        }
        ctx.report.collectFirst {
          case (n, Left(e)) if n == s"${contract.table}#$batchId" => e
        }.foreach { e =>
          throw new IllegalStateException(
            s"dual-sink batch $batchId failed; failing the query so the " +
              "checkpoint does not advance past it", e)
        }
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
  case class FunnelProgress(timesMs: List[Long])
  case class FunnelOut(user_id: Long, n_steps: Int, t_first: Timestamp,
                       t_last: Timestamp, completed: Boolean)

  /** Streaming ordered-funnel tracking via flatMapGroupsWithState — the
    * streaming twin of [[graft.operators.EventAnalytics.funnelTimes]]:
    * per-user state is the greedy-earliest step timestamps reached so
    * far; an event advances the funnel iff it is the NEXT step and
    * strictly after the last reached one. Completion emits immediately
    * (and clears state, so a user may convert again later); the
    * event-time timeout flushes a `completed = false` row for users
    * idle past `idleFlushSeconds`, giving downstream a
    * drop-off-by-stage signal without waiting for the stream to end.
    *
    * Equivalence contract with the batch operator: identical when each
    * user's events are PROCESSED in event-time order — within a
    * micro-batch arrivals are sorted by ts, across batches ordering is
    * up to the source (a step-1 event arriving after a later-batch
    * step-2 event cannot retroactively improve the chain; the batch
    * form, seeing everything, can). State is O(steps) longs per live
    * user — no event buffering.
    */
  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
                   idleFlushSeconds: Long,
                   lateness: String = "10 minutes"): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"duplicate funnel steps: $steps")
    require(idleFlushSeconds > 0,
      s"idleFlushSeconds must be positive, got $idleFlushSeconds")
    import events.sparkSession.implicits._

    def out(user: Long, timesMs: List[Long], completed: Boolean): FunnelOut =
      FunnelOut(user, timesMs.size, new Timestamp(timesMs.head),
        new Timestamp(timesMs.last), completed)

    def fn(user: Long, batch: Iterator[FunnelEvent],
           state: GroupState[FunnelProgress]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        val flushed = state.getOption.filter(_.timesMs.nonEmpty)
          .map(p => out(user, p.timesMs, completed = false)).iterator
        state.remove()
        flushed
      } else {
        val emitted = Seq.newBuilder[FunnelOut]
        var times = state.getOption.map(_.timesMs).getOrElse(Nil)
        // ts ties break by step POSITION (earlier funnel stage first,
        // non-step events last): iterator order within a group is
        // run-dependent, and a ts-only sort would make equal-timestamp
        // view/click races produce different state on replay
        val stepPos = steps.zipWithIndex.toMap
        batch.toSeq
          .sortBy(e => (e.ts.getTime, stepPos.getOrElse(e.event_type, Int.MaxValue)))
          .foreach { e =>
            val t = e.ts.getTime
            if (times.size < steps.size && e.event_type == steps(times.size) &&
                (times.isEmpty || t > times.last)) {
              times = times :+ t
              if (times.size == steps.size) {
                emitted += out(user, times, completed = true)
                times = Nil // conversion done; a fresh funnel may start
              }
            }
          }
        if (times.nonEmpty) {
          state.update(FunnelProgress(times))
          // clamp to just past the watermark: when a batch delivers only
          // non-advancing events (wrong step / duplicates) the desired
          // timeout can sit BEHIND the watermark, and
          // setTimeoutTimestamp throws on that — which would kill the
          // query on routine out-of-funnel traffic. Clamping means such
          // a user flushes at the next watermark advance instead.
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(
            math.max(times.last + idleFlushSeconds * 1000L, wm + 1L))
        } else state.remove()
        emitted.result().iterator
      }
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
