package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level word n-gram statistics — the count tables behind
  * n-gram language models, contamination reports and Gopher-style
  * "most frequent n-gram" audits, generalizing the unigram
  * `vocabulary` query and the adjacent-pair `bpe_pair_counts` query to
  * arbitrary n.
  *
  * Scale shape: shingles are generated per-row with the zero-shuffle
  * `sequence`+`transform` kernel ([[TextFunctions.wordShingles]]), the
  * count is a `groupBy` with automatic map-side partial aggregation
  * (each task pre-reduces its shingle stream before the single
  * exchange on the gram key), and the min-support cut happens in the
  * same aggregate stage — low-frequency mass (the overwhelming
  * majority of a 100 TB corpus's distinct n-grams, by Zipf) is
  * filtered BEFORE the ordered cut, so the top-k sort ranks only the
  * surviving grams. The final total order (count desc, gram asc) makes
  * the cut deterministic, like every other top-k in the repo.
  */
object Ngrams {

  /** Top-`k` word `n`-grams by corpus frequency among grams occurring
    * in at least `minCount` positions: (gram, n_docs, cnt), total-order
    * deterministic.
    */
  def ngramCounts(docs: DataFrame, id: Column, text: Column, n: Int,
                  minCount: Long = 2L, k: Int = 100): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k >= 1, s"k must be >= 1: $k")
    docs.select(id.as("doc_id"),
        explode(TextFunctions.wordShingles(text, n)).as("gram"))
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }
}
