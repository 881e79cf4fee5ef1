package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Self-supervised unigram language-model scoring — the cheapest member
  * of the model-based quality-filter family (CCNet/Gopher use a KenLM
  * 5-gram; the unigram form needs no external model because the corpus
  * IS the model): estimate p(w) = cf(w) / N from corpus token counts,
  * then score every document by its mean token log-probability. Low
  * scores flag gibberish / OCR noise / wrong-tokenization docs whose
  * tokens are rare corpus-wide; suspiciously high scores flag
  * stopword-soup boilerplate. The exact integer companions (`min_freq`,
  * `mean_freq`) are the rare-token signals used for threshold filters.
  *
  * Output: (doc_id, n_tokens, sum_freq, min_freq, mean_freq, logprob)
  *   n_tokens  — doc token count (long, exact)
  *   sum_freq  — Σ over doc tokens of corpus frequency cf(w) (long, exact)
  *   min_freq  — rarest token's corpus frequency (long, exact)
  *   mean_freq — sum_freq / n_tokens, ONE shared IEEE division over
  *               exact longs → bit-portable, DuckDB-oracle-checkable
  *   logprob   — (Σ tf·ln cf)/n_tokens − ln N, the actual mean token
  *               log-prob. A SUM of doubles is order-dependent across
  *               engines (ulp level), so this column is spec-checked
  *               with tolerance, not oracle-hashed — the tfidf
  *               RationalIdf-vs-LogIdf split, same reasoning.
  *
  * Scale shape (100 TB): ONE explode pass; per-(doc, token) counts
  * first (`tf`), so every downstream join and aggregate runs on the
  * reduced frame, not the raw token stream. The vocabulary aggregate
  * derives from `tf` with map-side partial combine (hot tokens collapse
  * before the shuffle) and BROADCASTS back (vocabulary-sized, fine to
  * ~100M tokens; `broadcastVocab = false` falls back to a shuffle
  * join). `tf` fans out two ways (vocab aggregate + score join), so it
  * is persisted by default — the TermWeights lineage-sharing argument;
  * same lifecycle contract (`persistTf = false` or
  * `spark.catalog.clearCache()` for long-lived sessions). The corpus
  * total N is a 1-row aggregate attached by broadcast. Per-doc
  * aggregation is an equi-shuffle on doc_id — documents are the
  * parallelism unit.
  */
object UnigramLm {

  def docUnigramStats(df: DataFrame, id: Column, text: Column,
                      broadcastVocab: Boolean = true,
                      persistTf: Boolean = true): DataFrame = {
    val tok = df.select(id.as("doc_id"),
      explode(TextFunctions.tokens(text)).as("token"))
    val tfUncached = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val tf =
      if (persistTf)
        tfUncached.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tfUncached
    val cfAgg = tf.groupBy(col("token")).agg(sum(col("tf")).as("cf"))
    val vocab = if (broadcastVocab) broadcast(cfAgg) else cfAgg
    val totals = tf.agg(sum(col("tf")).as("__n_total"))
    tf.join(vocab, "token")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("cf")).as("sum_freq"),
        min(col("cf")).as("min_freq"),
        sum(col("tf").cast("double") * log(col("cf").cast("double")))
          .as("__sum_log_cf"))
      .crossJoin(broadcast(totals))
      .withColumn("mean_freq",
        col("sum_freq").cast("double") / col("n_tokens").cast("double"))
      .withColumn("logprob",
        col("__sum_log_cf") / col("n_tokens").cast("double") -
          log(col("__n_total").cast("double")))
      .select(col("doc_id"), col("n_tokens"), col("sum_freq"),
        col("min_freq"), col("mean_freq"), col("logprob"))
  }
}
