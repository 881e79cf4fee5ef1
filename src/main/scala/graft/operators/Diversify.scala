package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Embedding-space data DIVERSIFICATION — the pruning half of the D4
  * recipe (Tirumala et al. 2023, "D4: Improving LLM Pretraining via
  * Document De-Duplication and Diversification"): after SemDeDup removes
  * semantic duplicates ([[SemDedup.semanticPrune]]), SSL-prototype
  * pruning (Sorscher et al. 2022, "Beyond neural scaling laws") drops
  * the most PROTOTYPICAL members of each embedding cluster — points
  * closest to their centroid carry the least marginal information, so
  * trimming them biases the kept corpus toward the informative tails
  * without the near-random loss of uniform downsampling.
  *
  * Scale shape: clustering is [[Ivf.fitDistributed]] (full-corpus Lloyd,
  * constant-size plan per round) or the bounded-sample [[Ivf.fit]];
  * assignment is the zero-shuffle argmax-cosine kernel; the prototype
  * rank is ONE window over the cluster partitioning (the corpus's single
  * exchange here — same key as the assignment write path, so a corpus
  * already bucketed by list_id pays nothing). A pathological giant
  * cluster serializes its own sort only — raise nlist so lists stay
  * thousands-sized (the SemDeDup operating guidance) rather than salting
  * a rank whose semantics are global per cluster.
  *
  * Determinism: rank orders by (centroid-cosine DESC, id ASC) — the tie
  * break makes the drop set exact given a centroid matrix. The matrix
  * itself is float-sum order-dependent across partitionings (Lloyd), so
  * end-to-end output is registered rows-only with in-plan count gates,
  * not engine-hashed.
  */
object Diversify {

  /** Drop the `dropFrac` most prototypical members of each cluster:
    * per cluster of size n, the floor(dropFrac·n) highest-cosine
    * members go (ties to the smaller id). Returns the kept rows of
    * `df`, schema unchanged. `dropFrac = 0.5` at 50 % of MiniCPM-scale
    * corpora was D4's operating point on its SSL-prototype stage.
    */
  def sslPrototypePrune(df: DataFrame, id: Column, vec: Column,
                        model: Ivf.IvfModel,
                        dropFrac: Double): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac must be in [0,1), got $dropFrac")
    if (dropFrac == 0.0) return df
    val assigned = Ivf.assign(model, df, id, vec)
      .join(broadcast(model.centroids), "list_id")
      .select(col("vec_id").as("__pid"), col("list_id"),
        VectorFunctions.cosine(col("v"), col("centroid")).as("__proto_sim"))
    val w = Window.partitionBy(col("list_id"))
      .orderBy(col("__proto_sim").desc, col("__pid"))
    val drops = assigned
      .withColumn("__rank", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("list_id"))))
      .filter(col("__rank") <= floor(lit(dropFrac) * col("__n")))
      .select(col("__pid"))
    df.join(drops, id === col("__pid"), "left_anti")
  }

  /** Per-cluster audit of a prototype prune: size before, dropped, kept,
    * and the exact floor identity `n_after = n - floor(dropFrac·n)` as
    * data — the registered query asserts it in-plan, so a rank-logic
    * regression fails every harness run loudly.
    */
  def prototypePruneProfile(df: DataFrame, id: Column, vec: Column,
                            model: Ivf.IvfModel,
                            dropFrac: Double): DataFrame = {
    val before = Ivf.assign(model, df, id, vec)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n_before"))
    val kept = sslPrototypePrune(df, id, vec, model, dropFrac)
    val after = Ivf.assign(model, kept, id, vec)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n_after"))
    before.join(after, Seq("list_id"), "left")
      .select(col("list_id"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        (col("n_before") - coalesce(col("n_after"), lit(0L))).as("n_dropped"))
  }
}
