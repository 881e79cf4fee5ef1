package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Semantic deduplication over an embedding column — the SemDeDup shape
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", arXiv:2303.09540): k-means-cluster
  * the embeddings, score cosine only WITHIN each cluster, call any pair
  * above `minCosine` a semantic duplicate, and keep exactly one document
  * per connected duplicate group.
  *
  * Where [[Dedup.embeddingNearDupPairs]] generates candidates with SRP
  * LSH (pair-local, threshold-tuned bit/band budget), SemDeDup's
  * clustering makes candidate generation GLOBAL: each vector lands in
  * one k-means list and only same-list pairs are scored, so the
  * comparison count drops from n²/2 to Σ|list|²/2 ≈ n²/(2·nlist) with
  * NO per-pair hashing. The trade is recall at the cluster boundary —
  * a duplicate pair split across two lists is invisible — which the
  * paper accepts by construction (duplicates cluster together far more
  * reliably than uniform-random points do; the registered
  * `semantic_dup_recall` gate measures exactly this miss rate on the
  * harness's adversarial uniform embeddings).
  *
  * Scale shape: the fit is [[Ivf.fit]]'s bounded driver sample
  * (≤25k rows regardless of corpus size), assignment is a per-row
  * codegen kernel over the broadcast centroid matrix, and the
  * within-list self-join is a plain equi-join on `list_id` — every
  * piece is the 100-TB-safe pattern already audited for `ivf_topk`.
  * The one genuine skew risk is a hot list (k-means on clustered real
  * corpora can produce lists far above n/nlist); at cluster scale raise
  * `nlist` (the paper runs 50k clusters for 60M+ docs, keeping lists in
  * the low thousands) — the quadratic-in-list-size cost is the
  * published algorithm's own contract, not an artifact of this
  * implementation.
  */
object SemDedup {

  /** Within-cluster semantic duplicate pairs `(id_a, id_b, cosine)`,
    * `id_a < id_b`, exact cosine ≥ `minCosine` (every emitted pair
    * carries its exact score — clustering only prunes CANDIDATES).
    * `nlist <= 1` degenerates to the verified all-pairs exact twin
    * (identical output contract to [[Dedup.embeddingNearDupPairs]] with
    * `bits = 0`), which is what the DuckDB oracle checks; the clustered
    * form is held to the same-scored-subset + recall-floor gates.
    */
  def semanticDupPairs(df: DataFrame, id: Column, vec: Column,
                       minCosine: Double, dim: Int, nlist: Int,
                       seed: Long = 42L): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"minCosine in (0, 1], got $minCosine")
    if (nlist <= 1)
      Dedup.embeddingNearDupPairs(df, id, vec, minCosine, dim,
        bits = 0, bands = 1)
    else {
      val assigned = Ivf.assign(Ivf.fit(df, vec, nlist, seed = seed),
        df, id, vec)
      assigned.as("a").join(assigned.as("b"),
          col("a.list_id") === col("b.list_id") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          VectorFunctions.cosine(col("a.v"), col("b.v")).as("cosine"))
        .filter(col("cosine") >= minCosine)
    }
  }

  /** Near-dup pairs over MULTI-PROBE IVF lists — the candidate arm for
    * thresholds LSH-OR cannot reach ([[Dedup.nearDupArm]]'s IvfArm):
    * when [[Dedup.srpOperatingPoint]]'s band demand blows past the 512
    * cap (low θ and/or large n — bands grow ∝ (n/occ)^ρ), per-pair SRP
    * recall degrades with nothing to buy it back, while IVF candidates
    * keep working: every vector probes its `nprobe` closest centroids
    * (a per-row codegen kernel over the broadcast centroid matrix — no
    * shuffle to generate probes), a pair is a candidate when ANY probed
    * list coincides (equi-join on list_id), and every candidate is
    * verified with the exact cosine. Recall comes from geometry rather
    * than OR-amplification: a pair at angle θ has both members near the
    * same centroid(s) unless it straddles a Voronoi boundary, and
    * multi-probe covers the straddle.
    *
    * Scale shape: candidates ≤ Σ_lists |list|² with |list| ≈
    * nprobe·n/nlist, so at [[Ivf.operatingPoint]]'s nlist ≈ √n the
    * candidate work is Θ(nprobe²·n^1.5) — sub-quadratic with a
    * threshold-INDEPENDENT exponent (SRP's ρ → 1 as θ → π/2; this arm
    * does not care). The `distinct()` before the vector rejoin keeps a
    * pair sharing several probed lists from being cosine-scored per
    * list (the [[Dedup.embeddingNearDupPairs]] argument).
    *
    * Output contract identical to [[Dedup.embeddingNearDupPairs]]:
    * `(id_a, id_b, cosine)`, `id_a < id_b`, exact scores, approximate
    * only by candidate omission — gate with a recall floor
    * (`embed_near_dup_ivf_scaled`).
    */
  def nearDupPairsIvf(df: DataFrame, id: Column, vec: Column,
                      minCosine: Double, nlist: Int, nprobe: Int,
                      seed: Long = 42L): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"minCosine in (0, 1], got $minCosine")
    require(nlist >= 1 && nprobe >= 1,
      s"nlist/nprobe must be >= 1, got $nlist/$nprobe")
    val coded = df.select(id.as("vec_id"), vec.as("v"))
    if (nlist <= 1)
      Dedup.embeddingNearDupPairs(df, id, vec, minCosine,
        dim = 0, bits = 0, bands = 1)
    else {
      val model = Ivf.fit(df, vec, nlist, seed = seed)
      val probed = df.select(id.as("vec_id"),
        explode(graft.functions.Kernels.topCentroidsCol(
          vec, model.matrix, math.min(nprobe, nlist))).as("list_id"))
      val cands = probed.as("a").join(probed.as("b"),
          col("a.list_id") === col("b.list_id") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .distinct()
      cands
        .join(coded.select(col("vec_id").as("id_a"), col("v").as("v_a")),
          "id_a")
        .join(coded.select(col("vec_id").as("id_b"), col("v").as("v_b")),
          "id_b")
        .select(col("id_a"), col("id_b"),
          VectorFunctions.cosine(col("v_a"), col("v_b")).as("cosine"))
        .filter(col("cosine") >= minCosine)
    }
  }

  /** Prune to one survivor per semantic-duplicate component: connected
    * components over the ≥`minCosine` pair graph, then one keep per
    * component under the chosen policy. Transitivity matters: cosine
    * near-duplicacy chains (A≈B≈C with cos(A,C) < τ), and a
    * pairwise-greedy drop would either keep chain middles or drop whole
    * chains depending on visit order — the component view makes "one per
    * group" exact, same as `dedup_clusters` does for text.
    *
    * Survivor policy:
    *  - default (`keepLowestCentroidSim = false`): minimum id — the
    *    repo's deterministic rule, reproducible across k-means refits.
    *  - `keepLowestCentroidSim = true`: the SemDeDup paper's rule
    *    (Abbas 2023 §2): keep the member with the LOWEST cosine to its
    *    cluster centroid, biasing kept data away from cluster
    *    prototypes. Ties (identical vectors) break to the lower id.
    *    NOT the default because centroid geometry changes under refit
    *    while ids do not. Selection is a map-side-combining `min_by`
    *    over (sim, id) per component — no per-component window sort,
    *    so a giant component costs the same as many small ones.
    *
    * Returns `df` filtered to survivors, schema unchanged. Cost on top
    * of pair generation: [[Dedup.connectedComponents]]'s iterative
    * equi-joins over the (tiny, already-thresholded) pair list, then one
    * left_anti of the corpus against the dropped members (the paper
    * policy adds the per-row centroid-sim kernel + one agg over the
    * component members — still nothing quadratic).
    */
  def semanticPrune(df: DataFrame, id: Column, vec: Column,
                    minCosine: Double, dim: Int, nlist: Int,
                    seed: Long = 42L,
                    keepLowestCentroidSim: Boolean = false): DataFrame = {
    val pairs = semanticDupPairs(df, id, vec, minCosine, dim, nlist, seed)
    // checkpointEvery=4 explicitly: the sf0.1 harness graph (uniform
    // embeddings at τ in the dense regime) is one giant component of
    // diameter ≫ 3, exactly the many-round case where unbounded CC
    // lineage built multi-GiB plan strings per convergence action
    val cc = Dedup.connectedComponents(pairs, checkpointEvery = 4)
    val drops =
      if (!keepLowestCentroidSim)
        cc.filter(col("id") =!= col("comp"))
          .select(col("id").as("__drop_id"))
      else {
        // same fit parameters as candidate generation, so members score
        // against the geometry that clustered them (nlist<=1 pairs come
        // from the exact twin; a single global centroid still gives the
        // paper's "away from the prototype" ordering)
        val model = Ivf.fit(df, vec, math.max(nlist, 1), seed = seed)
        val sims = Ivf.assign(model, df, id, vec)
          .join(broadcast(model.centroids), "list_id")
          .select(col("vec_id").as("id"),
            VectorFunctions.cosine(col("v"), col("centroid")).as("__csim"))
        val members = cc.join(sims, "id")
        val keeps = members.groupBy(col("comp"))
          .agg(min_by(col("id"), struct(col("__csim"), col("id")))
            .as("__keep_id"))
        members.join(keeps, "comp")
          .filter(col("id") =!= col("__keep_id"))
          .select(col("id").as("__drop_id"))
      }
    df.join(drops, id === col("__drop_id"), "left_anti")
  }

  /** Cross-set semantic contamination: flag TRAIN documents whose
    * embedding is ≥ `minCosine`-similar to any EVAL document — the
    * embedding analog of the n-gram [[Dedup]] contamination check, used
    * to decontaminate a pretraining corpus against held-out benchmark
    * suites when near-verbatim overlap has been paraphrased away (the
    * concern SemDeDup §4 raises for within-corpus duplicates applies
    * verbatim across the train/eval boundary). Emits every matching
    * `(train_id, eval_id, cosine)` pair, exact score attached — the
    * caller left_anti-joins the distinct train ids to drop, or audits
    * per-benchmark hit counts.
    *
    * Asymmetry is the whole design: eval suites are 1e3–1e6 rows while
    * the corpus is 1e9+, so the EVAL side (its `nprobe` probe lists per
    * row — a per-row kernel over the broadcast centroid matrix, no
    * shuffle) is broadcast and the train side is touched exactly once,
    * in place: assignment is a projection (same codegen argmin kernel as
    * [[Ivf.assign]]) and the candidate join is broadcast-hash on
    * `list_id` — ZERO exchange on the 100-TB side. Recall follows the
    * IVF operating point (raise `nprobe` toward `nlist` to trade cost
    * for recall; the registered gate measures it on uniform embeddings,
    * the adversarial case).
    *
    * `nlist <= 1` degenerates to the verified all-pairs exact twin
    * (broadcast nested-loop over the tiny eval side — the DuckDB oracle
    * anchor, never a production path).
    */
  def crossContamination(train: DataFrame, trainId: Column, trainVec: Column,
                         evalDf: DataFrame, evalId: Column, evalVec: Column,
                         minCosine: Double, nlist: Int,
                         nprobe: Int = 1, seed: Long = 42L): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"minCosine in (0, 1], got $minCosine")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    if (nlist <= 1) {
      val a = train.select(trainId.as("train_id"), trainVec.as("tv"))
      val b = evalDf.select(evalId.as("eval_id"), evalVec.as("ev"))
      a.crossJoin(broadcast(b))
        .select(col("train_id"), col("eval_id"),
          VectorFunctions.cosine(col("tv"), col("ev")).as("cosine"))
        .filter(col("cosine") >= minCosine)
    } else {
      val model = Ivf.fit(train, trainVec, nlist, seed = seed)
      val probes = evalDf.select(evalId.as("eval_id"), evalVec.as("ev"),
        explode(graft.functions.Kernels.topCentroidsCol(
          evalVec, model.matrix, math.min(nprobe, nlist))).as("list_id"))
      Ivf.assign(model, train, trainId, trainVec)
        .join(broadcast(probes), Seq("list_id"))
        .select(col("vec_id").as("train_id"), col("eval_id"),
          VectorFunctions.cosine(col("v"), col("ev")).as("cosine"))
        .filter(col("cosine") >= minCosine)
    }
  }
}
