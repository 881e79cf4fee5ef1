package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window document chunking — the context-window prep step of a
  * training / retrieval pipeline: cut every document into `chunkChars`
  * character windows advancing by `strideChars` (stride < chunk ⇒
  * overlapping windows, the standard RAG/pre-training shape that keeps
  * sentence fragments from being split without context on both sides).
  *
  * Scale shape: ZERO shuffle. Chunk starts are generated per-row with
  * `sequence` + `explode` (both codegen generators), the window text is
  * a `substr` projection, and the output inherits the scan's
  * partitioning — a 100 TB corpus chunks in one narrow pass with
  * filters/pruning still pushed to the parquet scan. The fan-out factor
  * is ~len/stride rows per document; downstream stages that need
  * balanced partitions after a skewed fan-out (one 10 MB doc → 80k
  * chunks in one task) should repartition on (doc_id, chunk_idx) — that
  * is the consumer's exchange to spend, not this operator's.
  */
object Chunking {

  /** One row per (document, window): (doc_id, chunk_idx, chunk_start,
    * chunk_text, chunk_chars). Starts are 0, stride, 2·stride, … while
    * start < length(text); the final window may be shorter than
    * `chunkChars` (it is NOT padded — packing is [[Packing]]'s job).
    * Empty or NULL documents emit no rows: there is no window to train
    * on, and emitting a zero-length chunk would poison downstream
    * token accounting.
    *
    * Offsets are character-based (`substr` semantics) and 0-based in
    * the output so `chunk_start` is directly usable as a slice offset;
    * `chunk_idx` = chunk_start / stride is derived, not row_number'd —
    * no window function, no ordering dependence, reproducible on any
    * partitioning.
    */
  def chunkDocuments(docs: DataFrame, id: Column, text: Column,
                     chunkChars: Int, strideChars: Int): DataFrame = {
    require(chunkChars > 0, s"chunkChars must be positive: $chunkChars")
    require(strideChars > 0 && strideChars <= chunkChars,
      s"strideChars must be in [1, chunkChars]: $strideChars")
    docs.select(id.as("doc_id"), text.as("__text"))
      .where(length(col("__text")) > 0)
      .select(col("doc_id"), col("__text"),
        explode(sequence(lit(0), length(col("__text")) - 1,
          lit(strideChars))).as("__start"))
      .select(col("doc_id"),
        (col("__start") / strideChars).cast("int").as("chunk_idx"),
        col("__start").cast("int").as("chunk_start"),
        col("__text").substr(col("__start") + 1, lit(chunkChars))
          .as("chunk_text"))
      .withColumn("chunk_chars", length(col("chunk_text")).cast("int"))
  }

  /** Token-window variant of [[chunkDocuments]]: windows of
    * `chunkTokens` whitespace tokens advancing by `strideTokens` — the
    * shape a tokenizer-aware packing stage consumes (char windows cut
    * words in half; token windows don't). Same zero-shuffle
    * generate+project plan; `chunk_text` re-joins the token slice with
    * single spaces, so for single-space-delimited input the
    * stride=chunk windows concatenate back to the document.
    *
    * Token semantics match [[graft.functions.TextFunctions.tokens]]
    * (single-space split, empties kept): an empty document is ONE empty
    * token under this tokenizer and yields one empty window — dropping
    * it would make token accounting disagree with `tokenCount`.
    * NULL documents yield no rows.
    */
  def chunkByTokens(docs: DataFrame, id: Column, text: Column,
                    chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens]: $strideTokens")
    docs.select(id.as("doc_id"), split(text, " ").as("__t"))
      .where(size(col("__t")) > 0)
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(0), size(col("__t")) - 1,
          lit(strideTokens))).as("__start"))
      .select(col("doc_id"),
        (col("__start") / strideTokens).cast("int").as("chunk_idx"),
        col("__start").cast("int").as("tok_start"),
        array_join(slice(col("__t"), col("__start") + 1,
          lit(chunkTokens)), " ").as("chunk_text"),
        least(col("__start") + chunkTokens, size(col("__t")))
          .minus(col("__start")).cast("int").as("chunk_tokens"))
  }

  /** Per-document chunking audit: window count and the character count
    * that survives into chunks (with overlap, > n_chars). One map-side
    * partial agg over [[chunkDocuments]] — the sanity gate a pipeline
    * runs before paying for embedding/tokenizing the chunk stream.
    */
  def chunkStats(docs: DataFrame, id: Column, text: Column,
                 chunkChars: Int, strideChars: Int): DataFrame =
    chunkDocuments(docs, id, text, chunkChars, strideChars)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(col("chunk_chars")).cast("long").as("chunked_chars"),
        max(col("chunk_start") + col("chunk_chars")).cast("int")
          .as("covered_to"))
}
