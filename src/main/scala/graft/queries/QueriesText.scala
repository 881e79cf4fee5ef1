package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Fingerprint, Fnv64, LogParse, TextFunctions, Timestamps, VectorFunctions}
import graft.operators.{Dedup, Explodes, Flatten, Multimodal, Sampling, Similarity}
import graft.sources.Tables

import QueryHelpers._

/** text analysis, quality scoring, BM25/retrieval, LM stats, DSIR — one registry slice of [[graft.SparkEntry.queries]]
  * (mechanical split; entries verbatim).
  */
private[graft] object QueriesText {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- LLM-pipeline: text analysis ----------------------------------
    "text_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.regexTokenCount(col("text")).as("n_word_tokens"),
        TextFunctions.avgTokenLength(col("text")).as("avg_token_len"),
        TextFunctions.stopwordCount(col("text"), TextFunctions.DefaultStopwords)
          .as("n_stopwords"),
        TextFunctions.langId(col("text")).as("lang_pred"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    }),
    "text_normalize" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.normalizeText(col("text")).as("norm_text"))
    }),
    "text_compressibility" -> ((s, dir) => {
      // compressibility quality heuristic: deflate ratio per document —
      // boilerplate/spam compresses far better than prose. Zero-shuffle
      // codegen kernel (thread-local zlib state, one compiled call per
      // row); zlib streams are JVM-specific, so rows-only — with the
      // structural invariant self-asserted. The bound scales with input
      // length: deflate's stored-block overhead is ~5 bytes per 64 KiB
      // block plus a few fixed bytes, so ratio <= 1.001 + 8/n_chars
      // (n_chars <= n_bytes, so the per-char bound is the loose side).
      // A constant ceiling would be WRONG: 1 raw byte deflates to 3
      // (ratio 3.0) — the r7 (0,2) assert threw on any 1-2 char doc.
      import graft.functions.Kernels
      t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          Kernels.deflateRatioCol(col("text")).as("deflate_ratio"))
        .where(assert_true(
          col("deflate_ratio") > 0.0 &&
          col("deflate_ratio") <=
            lit(1.001) + lit(8.0) / greatest(col("n_chars"), lit(1)),
          concat(lit("deflate_ratio above the stored-block bound for doc "),
            col("doc_id"))).isNull)
    }),
    "text_repetition" -> ((s, dir) => {
      // Gopher-style repetition quality signals: fraction of duplicate
      // word n-grams and fraction covered by the most frequent n-gram,
      // for n = 2 and 3. Per-row kernel — the whole query is a
      // projection with ZERO shuffle; the oracle's explode+groupBy form
      // shuffles every n-gram of the corpus to compute the same thing.
      val r2 = TextFunctions.repetitionStats(col("text"), 2)
      val r3 = TextFunctions.repetitionStats(col("text"), 3)
      def frac(num: Column, den: Column): Column =
        when(den > 0, num.cast("double") / den.cast("double"))
          .otherwise(lit(0.0))
      t(s, dir, "documents").select(col("doc_id"),
        element_at(r2, 1).cast("long").as("n_2grams"),
        frac(element_at(r2, 1) - element_at(r2, 2), element_at(r2, 1))
          .as("dup_2gram_frac"),
        frac(element_at(r2, 3), element_at(r2, 1)).as("top_2gram_frac"),
        element_at(r3, 1).cast("long").as("n_3grams"),
        frac(element_at(r3, 1) - element_at(r3, 2), element_at(r3, 1))
          .as("dup_3gram_frac"),
        frac(element_at(r3, 3), element_at(r3, 1)).as("top_3gram_frac"))
    }),
    "gopher_quality_flags" -> ((s, dir) => {
      // Gopher rule-filter gate (Rae et al. 2021 A1.1): measurements +
      // one boolean per rule + the conjunction. Pure zero-shuffle
      // projection of codegen kernels; every ratio is one IEEE division
      // over integer counts, so the full rule evaluation hash-matches
      // the DuckDB oracle.
      import graft.operators.Quality
      Quality.gopherQualityFlags(t(s, dir, "documents"), col("doc_id"),
        col("text"))
    }),
    "gopher_drop_histogram" -> ((s, dir) => {
      // corpus-level drop-reason audit over the same flags: how many
      // docs each rule rejects (non-exclusive) — one map-side-partial
      // aggregation, driver-sized output
      import graft.operators.Quality
      Quality.gopherDropHistogram(
        Quality.gopherQualityFlags(t(s, dir, "documents"), col("doc_id"),
          col("text")))
    }),
    "gopher_repetition_flags" -> ((s, dir) => {
      // the repetition half of the Gopher gate: top-n-gram coverage
      // (n=2..4) and duplicate-n-gram fractions (n=5..10) against the
      // paper's thresholds — nine zero-shuffle kernel passes; the
      // oracle recomputes each via explode+groupBy
      import graft.operators.Quality
      Quality.repetitionFlags(t(s, dir, "documents"), col("doc_id"),
        col("text"))
    }),
    "corpus_report" -> ((s, dir) => {
      // the one-pass curation dashboard: per-source doc/dup/token counts
      // + survivors under BOTH gates from a single scan (no join between
      // the gates), one aggregation by source; all-integer outputs make
      // the whole dashboard oracle-checkable
      import graft.operators.Quality
      Quality.corpusReport(t(s, dir, "documents"), col("source"), col("text"))
    }),
    "quality_calibrated" -> ((s, dir) => {
      // cross-source rank calibration of the logit quality score: a
      // webcrawl's 0.6 and a curated source's 0.6 are not the same
      // thing, so thresholds act on the per-source percent-rank
      // instead — "top 30 % of EACH source" becomes one global
      // predicate. percent_rank is (rank−1)/(n−1) with min-rank ties:
      // an exact rational of the group size, hash-portable.
      import graft.operators.Quality
      val docs = t(s, dir, "documents")
      val scored = Quality.logisticQualityScore(docs, col("doc_id"),
          col("text"))
        .select(col("doc_id"), col("quality_score"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      Quality.calibrateAcrossGroups(scored, col("doc_id"), col("source"),
          col("quality_score"))
        .select(col("id").as("doc_id"), col("group").as("source"),
          col("score").as("quality_score"), col("calibrated"))
    }),
    "quality_logit" -> ((s, dir) => {
      // classifier-style quality scoring (CCNet/RefinedWeb shape): a
      // linear logit over the Gopher features squashed through the
      // RATIONAL sigmoid x/(1+|x|) — exact IEEE arithmetic end to end,
      // so the full scored output hash-matches the oracle GENERATED
      // from the same weight constants. Zero-shuffle projection.
      import graft.operators.Quality
      Quality.logisticQualityScore(t(s, dir, "documents"), col("doc_id"),
        col("text"))
    }),
    "c4_page_filter" -> ((s, dir) => {
      // C4 §2.2 line+page rules (terminal punctuation, >=3 words/line,
      // javascript lines, lorem-ipsum / brace pages, >=5 sentences).
      // The harness corpus is single-line by construction, so the query
      // derives a deterministic line-structured page per doc IN PLAN —
      // 12-token lines; even docs' lines end with '.'; every 5th doc
      // gains a javascript line, every 7th a lorem-ipsum line, every
      // 11th a brace line — mirrored verbatim in the DuckDB oracle, so
      // every rule path carries live data at every sf. The operator
      // itself is pure builtin string arithmetic: the WHOLE output
      // (clean text included) hash-matches.
      import graft.operators.Quality
      val docs = t(s, dir, "documents")
      val toks = TextFunctions.tokens(col("text"))
      val emptyArr = array().cast("array<string>")
      val nl = ceil(size(toks).cast("double") / lit(12.0)).cast("int")
      val body = transform(sequence(lit(1), nl),
        i => concat(
          array_join(slice(toks, (i - lit(1)) * lit(12) + lit(1), lit(12)),
            " "),
          when(col("doc_id") % 2 === 0, lit(".")).otherwise(lit(""))))
      val page = concat_ws("\n", concat(body,
        when(col("doc_id") % 5 === 0,
          array(lit("see the javascript console output."))).otherwise(emptyArr),
        when(col("doc_id") % 7 === 0,
          array(lit("lorem ipsum dolor sit amet."))).otherwise(emptyArr),
        when(col("doc_id") % 11 === 0,
          array(lit("function demo() {"))).otherwise(emptyArr)))
      Quality.c4PageFilter(
        docs.select(col("doc_id"), page.as("page")),
        col("doc_id"), col("page"))
    }),
    "ngram_counts" -> ((s, dir) => {
      // corpus trigram count table (min support 2, top 100): the n-gram
      // LM / audit statistic generalizing vocabulary (n=1) and
      // bpe_pair_counts (adjacent pairs). Zipf tail dies in the
      // map-side partial agg; total order makes the cut deterministic.
      import graft.operators.Ngrams
      Ngrams.ngramCounts(t(s, dir, "documents"), col("doc_id"),
        col("text"), n = 3, minCount = 2L, k = 100)
    }),
    "vocabulary" -> ((s, dir) => {
      // corpus vocabulary with document frequencies - the word-count shape
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      toks.groupBy(col("token"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_occurrences") >= 5)
    }),
    "vocab_stats" -> ((s, dir) => {
      // per-source corpus diagnostics: token mass, type count, hapax
      // legomena (types occurring once WITHIN the source — the Zipf
      // tail whose share flags OCR noise / boilerplate-stripped text).
      // Two chained aggs, both map-side partial; all-integral output.
      t(s, dir, "documents")
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy(col("source"))
        .agg(sum(col("__cnt")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          count(when(col("__cnt") === 1L, lit(1))).as("n_hapax"))
    }),
    "tfidf_topterms" -> ((s, dir) => {
      // Per-document characteristic terms: tf-idf with the exact
      // rational rarity weight tf*(N+1)/(df+1) — bit-reproducible
      // across engines (one long product, one IEEE division), hence
      // hash-oracle-checkable, unlike a log idf (ulp-level libm
      // differences). One explode pass; df derives from the reduced
      // (doc, token) aggregate; vocabulary broadcasts.
      import graft.operators.TermWeights
      TermWeights.tfidfTopTerms(t(s, dir, "documents"), col("doc_id"),
        col("text"), k = 3)
    }),
    "bm25_index" -> ((s, dir) => {
      // BM25 index build, rational-idf flavour: the whole weight is
      // exact-long inputs through a fixed order of IEEE + * / (no log),
      // so the DuckDB oracle hash-matches every score bit-for-bit.
      // Production retrieval uses the classic LogIdf (bm25_search);
      // the saturation/length-normalization machinery under test here
      // is identical between the two.
      import graft.operators.{Bm25, TermWeights}
      Bm25.bm25Index(t(s, dir, "documents"), col("doc_id"), col("text"),
        k1 = 1.2, b = 0.75, weight = TermWeights.RationalIdf)
    }),
    "bm25_search" -> ((s, dir) => {
      // lexical retrieval over the LogIdf index: rows-only (libm log is
      // ulp-engine-specific and per-doc score is a double SUM) —
      // Bm25Spec checks the full formula and ranking against a
      // hand-rolled reference; query 94 carries a no-hit term on
      // purpose (absent terms must not contribute or error).
      import s.implicits._
      import graft.operators.{Bm25, TermWeights}
      val idx = bm25IndexFor(s, dir, TermWeights.LogIdf)
      val queries = Seq(
        (91L, "fast hash join"), (92L, "vector scan"),
        (93L, "slow merge sort"), (94L, "customer quantum"))
        .toDF("qid", "qtext")
      Bm25.bm25Search(idx, queries, col("qid"), col("qtext"), k = 10)
    }),
    "bm25_search_rational" -> ((s, dir) => {
      // oracle twin of bm25_search: RationalIdf index (bit-exact per
      // row, the bm25_index trick) + PORTABLE summation (ascending
      // sort + left fold — sum(double) order is nondeterministic under
      // partial aggregation, and the DuckDB side mirrors the fold with
      // list_reduce(list_sort(...))). Same queries, same k; production
      // keeps the LogIdf/plain-sum form.
      import s.implicits._
      import graft.operators.{Bm25, TermWeights}
      val idx = bm25IndexFor(s, dir, TermWeights.RationalIdf)
      val queries = Seq(
        (91L, "fast hash join"), (92L, "vector scan"),
        (93L, "slow merge sort"), (94L, "customer quantum"))
        .toDF("qid", "qtext")
      Bm25.bm25SearchPortable(idx, queries, col("qid"), col("qtext"), k = 10)
    }),
    "hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval, the RAG default: lexical (rational BM25, the
      // portable-sum form) and dense (exact cosine top-k) arms fused by
      // Reciprocal Rank Fusion. Query docs = the every-100th-doc set
      // CAPPED at doc_id < 6400 (≤ 64 pinned ids with embeddings) —
      // same pinned-query convention as hybrid_rrf_ann, for the same
      // reason (r11/r15 audits): the uncapped every-100th set GREW
      // with the corpus and made this row's 10× bench ratio a
      // query-load construction artifact (66 s, the full spread's
      // worst row; corpus scaling under a fixed query load is what
      // the number should measure). The %100 stride keeps the set
      // clear of the dense low-id exact-duplicate families, so BOTH
      // arms include the self-hit and fused rank 1 == query doc stays
      // the built-in identity sanity. RRF contributions are exact integer
      // divisions summed as longs — the entire three-stage pipeline
      // hash-matches DuckDB. At 100 TB the exact dense arm swaps for
      // the IVF/PQ arm: rrfFuse only consumes (query_id, id, rank).
      import graft.operators.{Bm25, Retrieval, TermWeights}
      val docs = t(s, dir, "documents")
      val embs = t(s, dir, "embeddings")
      val q = docs.filter(col("doc_id") % 100 === 0 &&
          col("doc_id") < 6400)
        .join(embs, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("qid"), col("text").as("qtext"),
          col("embedding").as("qv"))
      val idx = bm25IndexFor(s, dir, TermWeights.RationalIdf)
      val lex = Bm25.bm25SearchPortable(idx, q, col("qid"), col("qtext"),
          k = 20)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val dense = Similarity.bruteForceTopK(embs, col("vec_id"),
          col("embedding"), q, col("qid"), col("qv"), k = 20,
          excludeSelf = false)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      Retrieval.rrfFuse(Seq(lex, dense), k0 = 60, k = 10)
    }),
    "hybrid_rrf_ann" -> ((s, dir) => {
      // the PRODUCTION-shaped hybrid twin: same rational-BM25 lexical
      // arm, but the dense arm is the IVF ANN path — the plan a real
      // RAG stack runs at 100 TB, where brute-force cosine is not an
      // option. rrfFuse consumes only (query_id, id, rank), so this is
      // exactly the arm swap Retrieval.scala's scaladoc promises. The
      // fit is fitDistributed with quantized sums: BIT-REPRODUCIBLE
      // across partitionings/core counts, so the fused ranking (and
      // these gates) behave identically on any runner — the sampled
      // Ivf.fit varies with input splits, which made a strict gate
      // flap between environments. Rows-only (k-means float) with TWO
      // in-plan gates, both PRESENCE claims because presence is what
      // the structure actually guarantees: the dense arm must CONTAIN
      // the self-hit (the self list is always probed and cos(self) is
      // maximal — but an exact-DUPLICATE embedding with a lower id
      // ties at the same cosine and wins the deterministic tie-break,
      // so dense rank 1 is only duplicate-free-data strong), and the
      // fused top-10 must CONTAIN the self-hit (a lexical-only
      // competitor promoted by IVF probe misses can legitimately
      // overtake it for fused rank 1 — measured at sf0.01). Quality is
      // gated by the macro-recall floor in hybrid_rrf_ann_recall.
      // Lexical arm = the PRODUCTION bm25Search (partial-agg sum):
      // this query is rows-only, so it owes the oracle nothing, and
      // the portable sorted-fold sum it used through r13 was ~80% of
      // its 13 s bench cost (collect_list + interpreted HOF fold per
      // (query, doc) group over the dense-vocabulary corpus — r14
      // scratch decomposition: lex arm 9.5 s portable vs 3.2 s plain,
      // ANN arm 0.5 s, fusion +0.7 s). hybrid_rrf keeps the portable
      // sum: it is the hash-matched member of the family.
      import graft.operators.{Bm25, Ivf, Retrieval, TermWeights}
      val docs = t(s, dir, "documents")
      val embs = t(s, dir, "embeddings")
      // PINNED query set (64 fixed ids): the benched number must
      // measure CORPUS scaling, not query-load scaling — the previous
      // every-100th-doc set grew 10x with the corpus and made the 10x
      // bench ratio a construction artifact (r11 verdict)
      val q = docs.filter(col("doc_id") < 64)
        .join(embs, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("qid"), col("text").as("qtext"),
          col("embedding").as("qv"))
      val idx = bm25IndexFor(s, dir, TermWeights.RationalIdf)
      val lex = Bm25.bm25Search(idx, q, col("qid"), col("qtext"), k = 20)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val model = ivfModelFor(s, dir) // memoized fit — timed passes probe
      val assigned = Ivf.assign(model, embs, col("vec_id"), col("embedding"))
      val dense = Ivf.topK(model, assigned, q, col("qid"), col("qv"),
          k = 20, nprobe = 4, excludeSelf = false)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
        .withColumn("__self_in_dense",
          sum(when(col("query_id") === col("id"), 1L).otherwise(0L))
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("query_id"))))
        .where(assert_true(col("__self_in_dense") === 1,
          concat(lit("IVF probe lost the self-hit for query "),
            col("query_id"))).isNull)
        .drop("__self_in_dense")
      val fused = Retrieval.rrfFuse(Seq(lex, dense), k0 = 60, k = 10)
      // membership gate as a WINDOW over the fused frame (≤ |q|·k rows,
      // already partitioned by query_id from the fusion's rank window)
      // — a join against an aggregate of `fused` would re-evaluate both
      // retrieval arms a second time
      fused.withColumn("__n_self",
          sum(when(col("query_id") === col("id"), 1L).otherwise(0L))
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("query_id"))))
        .where(assert_true(col("__n_self") === 1,
          concat(lit("hybrid ANN fusion lost the self-hit for query "),
            col("query_id"))).isNull)
        .drop("__n_self")
    }),
    "hybrid_rrf_ann_recall" -> ((s, dir) => {
      // the ann_topk_recall pattern applied to the FUSED ranking: the
      // ANN-armed fusion's top-10 per query must recover most of the
      // exact-armed fusion's top-10. Floor 0.5 measured 0.68/0.88/0.805
      // at sf0.001/0.01/0.1 (the IVF fit is the bit-stable quantized
      // fitDistributed; the plain-sum lexical arm can flip exact-tie
      // ranks at ulp level run to run, but both fusions share the one
      // persisted lex frame so the comparison itself never skews — the
      // floor's ~0.3 margin absorbs tie noise). The lexical arm is
      // shared verbatim, so
      // every miss is attributable to IVF probe misses surviving
      // fusion — much rarer than raw dense-arm misses because the
      // lexical contribution re-anchors most candidates.
      import graft.operators.{Bm25, Ivf, Retrieval, TermWeights}
      val docs = t(s, dir, "documents")
      val embs = t(s, dir, "embeddings")
      // PINNED query set (64 fixed ids): the benched number must
      // measure CORPUS scaling, not query-load scaling — the previous
      // every-100th-doc set grew 10x with the corpus and made the 10x
      // bench ratio a construction artifact (r11 verdict)
      val q = docs.filter(col("doc_id") < 64)
        .join(embs, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("qid"), col("text").as("qtext"),
          col("embedding").as("qv"))
      val idx = bm25IndexFor(s, dir, TermWeights.RationalIdf)
      // production bm25Search (not the portable sorted-fold sum) —
      // same reasoning as hybrid_rrf_ann; the lex frame is SHARED by
      // both fusions, so whatever ulp order this run's partial
      // aggregation picked, both arms rank against identical lexical
      // scores and the recall measure compares like for like. The
      // sharing is made HARD, not best-effort: persist() blocks can be
      // evicted and recomputed between the two fusion reads, and a
      // recompute may reorder ulp-level BM25 ties — so the |q|·20-row
      // frame is collected once and recreated as a local DataFrame,
      // pinning one realization for both arms.
      val lexPlan = Bm25.bm25Search(idx, q, col("qid"), col("qtext"), k = 20)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val lex = s.createDataFrame(
        s.sparkContext.parallelize(lexPlan.collect().toIndexedSeq, 1),
        lexPlan.schema)
      val exactDense = Similarity.bruteForceTopK(embs, col("vec_id"),
          col("embedding"), q, col("qid"), col("qv"), k = 20,
          excludeSelf = false)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      val model = ivfModelFor(s, dir) // same memoized bit-stable fit
      val assigned = Ivf.assign(model, embs, col("vec_id"), col("embedding"))
      val annDense = Ivf.topK(model, assigned, q, col("qid"), col("qv"),
          k = 20, nprobe = 4, excludeSelf = false)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      def fuse(dense: DataFrame) =
        Retrieval.rrfFuse(Seq(lex, dense), k0 = 60, k = 10)
          .select(col("query_id"), col("id").as("neighbor_id"))
      recallGate(fuse(exactDense), fuse(annDense),
        floor = 0.5, what = "hybrid ANN fusion")
    }),
    "doc_bigram_stats" -> ((s, dir) => {
      // interpolated bigram-LM scoring (the KenLM-perplexity-filter
      // shape, one order up from doc_unigram_stats): conditional
      // p(w2|w1) with Jelinek-Mercer continuation backoff, BOTH
      // marginals derived from the single bigram count table — one
      // explode pass over the corpus, everything downstream vocab-sized.
      // Registered projection = the exact-integer columns + the one
      // shared division; the libm logprob is spec-checked (tolerance),
      // the unigram/tfidf split.
      import graft.operators.UnigramLm
      UnigramLm.docBigramStats(t(s, dir, "documents"), col("doc_id"),
        col("text"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_freq"),
          col("min_freq"), col("mean_freq"))
    }),
    "doc_unigram_stats" -> ((s, dir) => {
      // self-supervised unigram-LM quality scoring: corpus token
      // frequencies scored back onto each document. The oracle-checked
      // projection keeps the exact-integer columns + the single-division
      // mean_freq; the logprob column itself is a double SUM
      // (order-dependent at ulp level) and is spec-checked with
      // tolerance instead — the tfidf RationalIdf/LogIdf split.
      import graft.operators.UnigramLm
      UnigramLm.docUnigramStats(t(s, dir, "documents"), col("doc_id"),
        col("text"))
        .select(col("doc_id"), col("n_tokens"), col("sum_freq"),
          col("min_freq"), col("mean_freq"))
    }),
    // ----- LLM-pipeline: DSIR data selection ----------------------------
    "dsir_weights" -> ((s, dir) => {
      // DSIR (Xie 2023) importance statistics of the raw corpus (every
      // source but src0) against the src0 target slice — the
      // decontamination-style src0-as-reference convention. Portable
      // md5 bucket hashing, so the exact-integer columns and the two
      // single-division doubles are oracle-hashed end to end; the libm
      // log_weight column is spec-checked (DsirSpec) and projected out.
      import graft.operators.Dsir
      val docs = t(s, dir, "documents")
      Dsir.importanceWeights(
        docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
        buckets = 1024)
        .select(col("doc_id"), col("n_grams"), col("n_feats"),
          col("sum_target_freq"), col("sum_raw_freq"),
          col("min_target_freq"), col("mean_target_freq"),
          col("target_ratio"))
    }),
    "dsir_select" -> ((s, dir) => {
      // the exact-arithmetic selection twin: top-200 most target-like
      // raw docs by the bit-portable target_ratio (ties -> lower id).
      // Same TakeOrderedAndProject plan as the production Gumbel form.
      import graft.operators.Dsir
      val docs = t(s, dir, "documents")
      val w = Dsir.importanceWeights(
        docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
        buckets = 1024)
      Dsir.selectTopK(w, 200)
        .select(col("doc_id"), col("n_grams"), col("target_ratio"))
    }),
    "dsir_resample" -> ((s, dir) => {
      // the paper's production path: Gumbel top-k sampling without
      // replacement with P(doc) ∝ w(doc) over the engine-hash (xxhash64)
      // feature space. libm on top of libm -> rows-only here; DsirSpec
      // pins determinism, exact-k and the selection bias.
      import graft.operators.Dsir
      val docs = t(s, dir, "documents")
      val w = Dsir.importanceWeights(
        docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
        buckets = 1024, portableHash = false)
      Dsir.gumbelResample(w, 200)
        .select(col("doc_id"), col("n_grams"), col("log_weight"))
    })
  )
}
