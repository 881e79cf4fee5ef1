package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string matching (record linkage): find pairs of values
  * within a bounded edit distance without comparing all pairs — the
  * primitive behind entity canonicalization in a training-data pipeline
  * (merge "red widget" / "red widgets" catalog variants, link author or
  * site names across crawls) and fuzzy dedup of short fields where
  * shingle/MinHash machinery is overkill.
  *
  * The shape that scales: linkage runs on the DICTIONARY (distinct
  * values + their corpus frequencies — one hash agg over the corpus),
  * never on corpus rows; candidates come from token blocking (two
  * values are compared only if they share an exact token), and the
  * verify step is the exact Levenshtein distance, so precision is 1 by
  * construction. Candidate count is bounded by Σ df² over DICTIONARY
  * token frequencies — independent of corpus size — and the
  * `maxTokenDf` guard drops blocking keys too frequent to
  * discriminate (a stop-token like a ubiquitous brand word would
  * otherwise quadratically dominate the block join; dropping it costs
  * recall only for pairs whose EVERY shared token is that hot, which
  * are the least-informative matches).
  *
  * Recall contract, stated honestly: a true pair is found iff at least
  * one token survives both edits and the df cap. Pairs whose edits
  * touch every shared token are missed — the standard
  * blocking-vs-recall trade-off (Ed-Join, Xiao 2008, makes the same
  * bet with q-gram prefixes). The exact all-pairs form
  * ([[allPairsEditJoin]]) is the ground-truth twin for
  * dictionary-sized inputs and recall audits.
  */
object FuzzyJoin {

  /** Distinct (id, token) pairs of the whitespace-split name. */
  private def tokens(df: DataFrame, id: Column, name: Column): DataFrame =
    df.select(id.as("__id"), name.as("__name"))
      .select(col("__id"), col("__name"),
        explode(split(col("__name"), " ")).as("__tok"))
      .where(length(col("__tok")) > 0)
      .distinct()

  /** Pairs (id_a, id_b, name_a, name_b, dist) with dist ≤ `maxDist`,
    * id_a < id_b, candidates blocked on shared tokens with document
    * frequency ≤ `maxTokenDf`. Plans: one explode+distinct, one df
    * agg, one equi-join on the token, one distinct, one codegen'd
    * levenshtein filter — no cartesian anywhere.
    *
    * Two verify-side prunes keep the exact step cheap at dictionary
    * scale: a length-difference filter (|len(a)−len(b)| > maxDist is
    * already dist > maxDist — free, and it runs BEFORE the distinct so
    * unverifiable candidates never enter that exchange) and the
    * THRESHOLDED levenshtein (Spark's 3-arg form computes only the
    * Ukkonen band of width 2·maxDist+1 and early-exits to −1 above the
    * bound — O(maxDist·len) per pair instead of O(len²), exact for
    * every pair kept, so the oracle is untouched).
    */
  def tokenBlockedEditJoin(df: DataFrame, id: Column, name: Column,
                           maxDist: Int,
                           maxTokenDf: Long = 1000L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxTokenDf >= 1, s"maxTokenDf must be >= 1, got $maxTokenDf")
    val toks = tokens(df, id, name)
    val keep = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxTokenDf)
      .select(col("__tok"))
    val blocked = toks.join(keep, Seq("__tok"))
    val cands = blocked.as("a").join(blocked.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id") &&
          abs(length(col("a.__name")) - length(col("b.__name"))) <=
            lit(maxDist))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__name").as("name_a"), col("b.__name").as("name_b"))
      .distinct()
    cands
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist") >= 0)
  }

  /** Ground-truth all-pairs edit join — QUADRATIC in `df`, for
    * dictionary-sized inputs and recall audits only (the same
    * capped-anchor convention as the repo's exact ANN twins; the
    * scaladoc of the production form explains why blocking exists).
    */
  def allPairsEditJoin(df: DataFrame, id: Column, name: Column,
                       maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val l = df.select(id.as("id_a"), name.as("name_a"))
    val r = df.select(id.as("id_b"), name.as("name_b"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
  }
}
