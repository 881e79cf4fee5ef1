package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus statistics for tokenizer training — the distributed half of a
  * BPE build. One BPE iteration is "count every adjacent symbol pair,
  * merge the most frequent"; the count is the data-scale part (one pass
  * over 100 TB of text) while the merge-table update is O(vocab) on the
  * driver. This operator computes that count: adjacent whitespace-token
  * pairs ranked by frequency. Iterating an actual BPE training loop is
  * a driver-side loop that re-invokes this with the previous winner
  * merged — each iteration one Spark job, state = the merge list
  * (kilobytes), which is exactly how distributed tokenizer trainers
  * split the work.
  *
  * Scale shape: explode the zipped (tokens[i], tokens[i+1]) stream —
  * codegen generator, no shuffle — into ONE hash aggregation on the
  * pair key. Partial (map-side) aggregation collapses each task's
  * stream to its local distinct pairs before the exchange, so the
  * shuffle carries ~|local vocab²∩seen| rows per task, not one row per
  * corpus token. The top-k is a TakeOrderedAndProject (per-partition
  * heap + driver merge of k rows), never a global sort.
  */
object BpeStats {

  /** Top-`k` adjacent token pairs: (a, b, cnt), ordered cnt desc with
    * (a, b) as the total-order tie-break so the cut at rank k is
    * deterministic on any partitioning. Tokens are single-space splits
    * (TextFunctions.tokens semantics — empties kept, matching
    * `string_split`); documents with fewer than two tokens contribute
    * nothing.
    */
  def pairCounts(docs: DataFrame, text: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val t = split(text, " ")
    docs.select(t.as("__t"))
      .where(size(col("__t")) >= 2)
      .select(explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(k)
  }
}
