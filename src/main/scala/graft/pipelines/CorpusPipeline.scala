package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.{Fingerprint, TextFunctions}
import graft.operators.{Dedup, Multimodal}
import graft.sinks.ParquetSink

/** The training-data curation pipeline — the composed "what this engine
  * is for at 100 TB" path over a raw documents table:
  *
  *   raw → text stats (tokens / language / quality)
  *       → quality + language gate
  *       → exact dedup (hash groupBy on text)
  *       → MinHash-LSH near-dedup (banded candidate join, greedy prune)
  *       → enriched corpus (+ fingerprints, simhash, stub features)
  *
  * Each stage is a pure DataFrame → DataFrame function (composable and
  * unit-testable); `run` materializes the stages to parquet. Everything
  * heavy is per-row kernels or key equi-joins — no stage is quadratic in
  * the corpus.
  */
object CorpusPipeline {

  final case class Config(minQuality: Double = 0.3,
                          keepLangs: Seq[String] = Seq("en"),
                          minTokens: Int = 5,
                          shingleSize: Int = 3,
                          numHashes: Int = 128,
                          bands: Int = 32,
                          minEstJaccard: Double = 0.8,
                          featureDim: Int = 16)

  /** Stage 1: annotate with the text-analysis features. */
  def annotate(docs: DataFrame): DataFrame =
    docs.select(col("*"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      TextFunctions.qualityScore(col("text")).as("quality"))

  /** Stage 2: the quality gate — pure pushdown-friendly filters. */
  def qualityGate(annotated: DataFrame, cfg: Config): DataFrame =
    annotated
      .filter(col("n_tokens") >= cfg.minTokens)
      .filter(col("quality") >= cfg.minQuality)
      .filter(col("lang_pred").isin(cfg.keepLangs: _*))

  /** Stage 3: exact dedup — one hash aggregation, min-id survivor.
    *
    * Shape (r18): the survivors ARE [[Dedup.exactKeepMinId]]'s keep_ids,
    * so one id-keyed left_semi join selects them directly. The previous
    * route through [[Dedup.exactDuplicateIds]] + anti-join planned the
    * aggregate, a join back on the RAW TEXT key (shuffling every
    * document's text a second time), and an id anti-join — one exchange
    * more, and the widest one in the stage. Identical survivor set by
    * construction (doc_id is unique; a row survives iff its id is its
    * text group's min).
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.join(
      Dedup.exactKeepMinId(docs, col("text"), col("doc_id"))
        .select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Stage 4: near-dedup via MinHash LSH, greedy min-id survivor. */
  def nearDedup(docs: DataFrame, cfg: Config): DataFrame =
    Dedup.applyPairDedup(docs, col("doc_id"),
      Dedup.minhashDedupPairs(docs, col("doc_id"), col("text"),
        cfg.numHashes, cfg.shingleSize, cfg.bands, cfg.minEstJaccard))

  /** Stage 5: enrich the surviving corpus with dedup-ready artifacts for
    * downstream consumers (all per-row kernels, zero shuffle).
    */
  def enrich(docs: DataFrame, cfg: Config): DataFrame =
    docs.select(col("*"),
      Fingerprint.winnow(col("text"), k = 5, w = 4).as("fingerprints"),
      graft.functions.Kernels.simhash64(TextFunctions.tokens(col("text")))
        .as("simhash"),
      Multimodal.stubFeatureVector(col("text").cast("binary"), cfg.featureDim)
        .as("features"))

  /** Incremental curation — the daily-increment shape of the funnel:
    * gate + exact-dedup + near-dedup the new documents against themselves
    * AND against the accumulated corpus's stored MinHash signatures,
    * WITHOUT touching the accumulated documents. Returns
    * (curated increment, signatures of the kept increment docs) — append
    * the signatures to the signature store so tomorrow's increment
    * dedups against today's survivors too.
    *
    * This is the 100 TB pattern: the corpus-side cost of a day's dedup is
    * one banded equi-join against a signature table (a few hundred bytes
    * per accumulated doc), not a re-scan of the accumulated text.
    *
    * Both returned frames share persisted intermediates (same lifecycle
    * note as the pair operators: blocks live until session cache cleanup).
    */
  def curateIncrement(newDocs: DataFrame, refSigs: DataFrame,
                      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val (curated, keptSigs, _) = curateIncrementManaged(newDocs, refSigs, cfg)
    (curated, keptSigs)
  }

  /** [[curateIncrement]] plus handles to the funnel's persisted
    * intermediates, for callers that own a long-lived session (e.g. the
    * streaming loop) and must free them after materializing both
    * results: `Dataset.unpersist` drops the cached blocks AND the
    * cache-manager plan entry, which an RDD-level unpersist would leak —
    * one leaked entry per persist per batch, scanned by every
    * subsequent query's cache lookup.
    */
  def curateIncrementManaged(newDocs: DataFrame, refSigs: DataFrame,
                             cfg: Config = Config()): (DataFrame, DataFrame, Seq[DataFrame]) = {
    // persist the ref side HERE (not inside minhashPairsAgainst, which
    // would also do it) so the handle rides the managed seq and the
    // streaming loop can free it per batch; a caller-cached ref is
    // respected, matching the operator's own convention
    import org.apache.spark.storage.StorageLevel
    val refCached = refSigs.storageLevel != StorageLevel.NONE
    val ref = if (refCached) refSigs
      else refSigs.persist(StorageLevel.MEMORY_AND_DISK)
    val (curated, keptSigs, persisted) = curateAgainst(newDocs, cfg)(sigs =>
      Dedup.minhashPairsAgainst(sigs, ref,
        cfg.numHashes, cfg.bands, cfg.minEstJaccard))
    (curated, keptSigs, if (refCached) persisted else persisted :+ ref)
  }

  /** The shared incremental funnel: gate → self-dedup → signatures →
    * cross-pairs (strategy supplied by the caller) → prune → enrich.
    * Returns (curated, keptSigs, persisted intermediates).
    */
  private def curateAgainst(newDocs: DataFrame, cfg: Config)(
      crossPairsOf: DataFrame => DataFrame): (DataFrame, DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.storage.StorageLevel
    val gated = qualityGate(annotate(newDocs), cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // within-increment dedup: exact survivors first ...
    val exact = exactDedup(gated)
    // ... then ONE signature pass over them (r18): a MinHash signature
    // is a pure per-row function of the text, so the self-LSH pairs,
    // the cross-corpus band join and keptSigs can all share the same
    // frame — the previous shape ran the (dominant) minhash kernel
    // TWICE, once inside nearDedup over the exact survivors and again
    // over selfClean for the cross join, recomputing identical values
    // for every surviving doc.
    val sigsAll = Dedup.minhashSignatures(exact, col("doc_id"), col("text"),
        cfg.numHashes, cfg.shingleSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // self-pairs from the shared signatures, persisted LAZILY on
    // purpose (r18 re-measured): an eager Pin here hands both anti-join
    // consumers an ExistingRDD with no size statistics, and the
    // planner flipped every drop-list anti-join from broadcast-hash to
    // sort-merge (the graph_triangles stats-loss lesson — full-stream
    // sorts to drop a thresholded pair list). With a lazy persist the
    // plan keeps the child's small estimate (broadcast, as before the
    // refactor) and the two consumers' broadcast BUILDS serialize the
    // cache fill, so the LSH self-join still evaluates once.
    val selfPairs = Dedup.minhashDedupPairsFromSigs(sigsAll, cfg.numHashes,
        cfg.bands, cfg.minEstJaccard)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val selfDropIds = selfPairs.select(col("id_b").as("doc_id")).distinct()
    val selfClean = Dedup.applyPairDedup(exact, col("doc_id"), selfPairs)
    // signatures of the self-clean survivors = the shared frame minus
    // the dropped ids (identical values: signatures depend only on the
    // text, and selfClean ⊆ exact)
    val sigs = sigsAll.join(selfDropIds, Seq("doc_id"), "left_anti")
    // clean is consumed TWICE (enrich -> curated, and the keptSigs
    // semi-join); persisting it keeps the expensive cross-corpus band
    // join from running once per consumer
    val clean = Dedup.applyPairDedup(selfClean, col("doc_id"), crossPairsOf(sigs))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val keptSigs = sigs.join(clean.select("doc_id"), Seq("doc_id"), "left_semi")
    (enrich(clean, cfg), keptSigs, Seq(gated, sigsAll, clean))
  }

  /** Stage a day's kept signatures as the accumulated signature STORE —
    * two catalog tables (bucketing metadata lives in the catalog):
    *
    *  - `<table>_banded`: the banded form (doc_id, band_idx, band_hash),
    *    bucketed AND sorted by band_hash. Tomorrow's cross-increment
    *    band join ([[graft.operators.Dedup.minhashPairsAgainstBanded]])
    *    then reads co-located buckets and plans no store-side exchange —
    *    the store, which grows with the corpus, is never reshuffled;
    *    only the day's increment is (asserted in PlanAuditSpec).
    *  - `<table>`: the raw (doc_id, sig, n_sh) signatures, joined only
    *    for verified candidates (storing sig inside the banded table
    *    would duplicate the 1 KB signature × bands).
    *
    * Append mode accumulates days; Spark appends to a bucketed table
    * with the same bucket spec without reshuffling existing data.
    *
    * The two writes are NOT one transaction. The raw table is written
    * FIRST because it is the source of truth — the banded table is an
    * INDEX derived from it. A crash in between leaves the index stale
    * (missing doc_ids generate no candidates, so their duplicates would
    * be silently admitted): run [[verifySignatureStore]] after a failed
    * load, and [[repairSignatureStore]] to rebuild the index from the
    * raw table.
    */
  def writeSignatureStore(sigs: DataFrame, table: String, cfg: Config,
                          buckets: Int,
                          mode: SaveMode = SaveMode.Append): Unit = {
    sigs.write.mode(mode).format("parquet").saveAsTable(table)
    ParquetSink.writeBucketed(
      Dedup.lshBands(sigs, cfg.numHashes, cfg.bands),
      s"${table}_banded", "band_hash", buckets, mode)
  }

  /** Reconcile the banded index with its raw signature table: true iff
    * they cover exactly the same doc_ids (two anti-join counts — cheap
    * next to a band join). False means a [[writeSignatureStore]] run
    * died between its two writes; repair before the next increment.
    */
  def verifySignatureStore(spark: org.apache.spark.sql.SparkSession,
                           table: String): Boolean = {
    val raw = spark.table(table).select("doc_id").distinct()
    val idx = spark.table(s"${table}_banded").select("doc_id").distinct()
    raw.join(idx, Seq("doc_id"), "left_anti").isEmpty &&
      idx.join(raw, Seq("doc_id"), "left_anti").isEmpty
  }

  /** Rebuild the banded index from the raw signature table — the
    * recovery path for a partial [[writeSignatureStore]].
    */
  def repairSignatureStore(spark: org.apache.spark.sql.SparkSession,
                           table: String, cfg: Config, buckets: Int): Unit =
    ParquetSink.writeBucketed(
      Dedup.lshBands(spark.table(table), cfg.numHashes, cfg.bands),
      s"${table}_banded", "band_hash", buckets, SaveMode.Overwrite)

  /** [[curateIncrement]] against the staged signature store written by
    * [[writeSignatureStore]]: same funnel, but the cross-increment band
    * join consumes the PRE-BANDED bucketed table, so the store side of
    * the join plans no exchange. Does NOT append the kept signatures —
    * call [[writeSignatureStore]] with the returned frame once the
    * curated increment has been committed downstream.
    */
  def curateIncrementFromStore(newDocs: DataFrame, table: String,
                               cfg: Config = Config()): (DataFrame, DataFrame) = {
    val spark = newDocs.sparkSession
    val (curated, keptSigs, _) = curateAgainst(newDocs, cfg)(sigs =>
      Dedup.minhashPairsAgainstBanded(sigs, spark.table(s"${table}_banded"),
        spark.table(table), cfg.numHashes, cfg.bands, cfg.minEstJaccard))
    (curated, keptSigs)
  }

  /** Full run, staged to parquet; returns per-stage row counts. */
  def run(ctx: PipelineContext, docs: DataFrame,
          cfg: Config = Config()): Map[String, Long] = {
    // gated feeds exactDuplicateIds (twice: keep + join) AND the anti-join
    // left side — without persist the annotate filters (HOF langId etc.)
    // run 3x; same for the exact-deduped lineage feeding LSH + anti-join
    ctx.persisted(qualityGate(annotate(docs), cfg)) { gated =>
      val exact = exactDedup(gated)
      val path = s"${ctx.stagingDir}/corpus_curated"
      ctx.persisted(exact) { e =>
        val curated = enrich(nearDedup(e, cfg), cfg)
        ParquetSink.write(curated, path, SaveMode.Overwrite)
        Map(
          "raw" -> docs.count(),
          "gated" -> gated.count(),
          "exact_deduped" -> e.count(),
          "curated" -> ctx.spark.read.parquet(path).count())
      }
    }
  }
}
