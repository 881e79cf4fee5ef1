package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — combining a lexical arm (BM25) and a dense
  * arm (embedding top-k) into one ranking via Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher 2009, "Reciprocal rank fusion
  * outperforms Condorcet and individual rank learning methods", SIGIR):
  * score(q, d) = Σ_arms 1 / (k0 + rank_arm(q, d)). RRF only consumes
  * RANKS, so arms with incomparable score scales (BM25 logits vs
  * cosines) fuse without calibration — the reason it is the default
  * fusion in RAG retrieval stacks.
  *
  * The reciprocal is computed as `scale div (k0 + rank)` — EXACT integer
  * division summed as longs, so the fused scores and ranking reproduce
  * bit-for-bit in any engine (the floating 1/(k0+r) form differs only
  * by a monotone transform at fixed scale, but its double SUM would be
  * order-dependent). With the default scale = 1e9 the quotients for
  * distinct ranks stay distinct through k0 + rank ~ 31k, far past any
  * practical arm depth, so the integer form induces the same order the
  * real-valued RRF would.
  *
  * Scale shape: each arm is already query-bounded (≤ k rows per query),
  * so the union and the (query_id, id) aggregation touch
  * |queries| · k · arms rows — independent of corpus size; the final
  * per-query rank is a window over ≤ k · arms candidates. Arms are
  * pluggable: anything emitting (query_id, id, rank) fuses, so the
  * brute-force exact arm used by the oracle swaps for the IVF/PQ ANN
  * arm at 100 TB without touching the fusion — and that swap is
  * REGISTERED, not just claimed: `hybrid_rrf_ann` runs the IVF-armed
  * fusion under an in-plan self-hit identity gate, and
  * `hybrid_rrf_ann_recall` holds its fused top-10 to a macro-recall
  * floor against the exact-armed fusion.
  */
object Retrieval {

  /** Fuse ranked arms. Each input must carry `query_id`, `id`, `rank`
    * (1-based). Returns (query_id, id, n_arms, rrf_score, rank) — the
    * fused top `k` per query, rrf_score DESC with id ASC tie-break.
    */
  def rrfFuse(arms: Seq[DataFrame], k0: Int = 60, k: Int = 10,
              scale: Long = 1000000000L): DataFrame =
    rrfFuseWeighted(arms.map(_ -> scale), k0, k)

  /** Weighted RRF: score(q, d) = Σ_arms scale_arm div (k0 + rank) — the
    * standard arm-bias knob (e.g. 2:1 lexical:dense) with the same
    * exact-integer reproducibility; [[rrfFuse]] is the uniform case.
    */
  def rrfFuseWeighted(arms: Seq[(DataFrame, Long)], k0: Int = 60,
                      k: Int = 10): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one arm")
    require(k0 >= 0, s"k0 must be >= 0: $k0")
    require(k >= 1, s"k must be >= 1: $k")
    arms.foreach { case (_, s) =>
      require(s >= 1, s"arm scale must be >= 1: $s") }
    val u = arms.map { case (df, scale) =>
      // `div` = exact integer division (Spark's `/` is always IEEE double)
      df.select(col("query_id"), col("id"),
        expr(s"${scale}L div ($k0 + rank)").as("__contrib"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("id").asc)
    u.groupBy(col("query_id"), col("id"))
      .agg(count(lit(1)).as("n_arms"), sum(col("__contrib")).as("rrf_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("n_arms"),
        col("rrf_score"), col("rank"))
  }
}
