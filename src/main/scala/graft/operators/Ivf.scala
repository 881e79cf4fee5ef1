package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Kernels, VectorFunctions}

/** IVF (inverted-file) approximate nearest neighbor — the centroid-
  * partitioned scale path complementing the SRP-LSH variant
  * ([[Similarity.srpBucketTopK]]):
  *
  *   1. fit k-means centroids on (a sample of) the corpus;
  *   2. assign every corpus vector to its nearest centroid — the
  *      "inverted lists", a plain (list_id → rows) partitioning;
  *   3. per query, probe the `nprobe` nearest centroids and rerank only
  *      those lists' vectors exactly.
  *
  * Both the corpus assignment and the query probe list are PER-ROW codegen
  * kernels over the broadcast centroid matrix ([[Kernels.nearestCentroid]]
  * / [[Kernels.topCentroids]]) — zero shuffle, zero row inflation. The
  * former crossJoin(centroids) + row_number plan inflated the corpus
  * ×nlist and shuffled the inflated corpus just to compute an argmin; at
  * nlist=1024 on a real corpus that is a 1000× intermediate in the write
  * path. Candidate generation at query time is an equi-join on list_id,
  * never a cross join.
  *
  * At scale the corpus assignment is write-once (store `list_id` as a
  * partition column) and queries touch nprobe/nlist of the data.
  */
object Ivf {

  /** Model = the centroid matrix (nlist × dim, driver-side — it IS the
    * model, nlist rows) plus its DataFrame form for inspection/persist.
    */
  case class IvfModel(centroids: DataFrame /* (list_id, centroid) */,
                      matrix: Array[Array[Double]])

  /** Fit nlist centroids. `sampleFraction` bounds the k-means input at
    * scale (k-means itself is iterative Spark jobs, fine; the sample
    * bounds per-iteration cost — list assignment quality is insensitive
    * to sampling because only the centroid POSITIONS matter).
    */
  def fit(corpus: DataFrame, vec: Column, nlist: Int,
          sampleFraction: Double = 1.0, seed: Long = 42L): IvfModel = {
    val base = if (sampleFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, sampleFraction, seed)
    val feats = base.select(array_to_vector(vec.cast("array<double>")).as("features"))
    // bucketing doesn't need converged centroids — 10 iterations of
    // k-means gives stable-enough lists at half the fit cost
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(feats)
    val spark = corpus.sparkSession
    import spark.implicits._
    val matrix = model.clusterCenters.map(_.toArray)
    val rows = matrix.zipWithIndex.toSeq.map { case (c, i) => (i, c) }
    IvfModel(rows.toDF("list_id", "centroid"), matrix)
  }

  /** Assign each corpus row to its nearest centroid: one argmin kernel
    * call per row over the broadcast centroid matrix — a narrow map with
    * NO exchange and NO row inflation (this is the 100-TB write path).
    * Ties break to the lower list_id (same contract as an ORDER BY
    * cosine DESC, list_id ASC argmin).
    */
  def assign(model: IvfModel, corpus: DataFrame, id: Column,
             vec: Column): DataFrame =
    corpus.select(id.as("vec_id"), vec.as("v"),
      Kernels.nearestCentroidCol(vec, model.matrix).as("list_id"))

  /** ANN top-k: probe the `nprobe` closest lists per query (per-row
    * kernel, no shuffle of the query side), rerank exactly. Candidate
    * generation = equi-join on list_id.
    */
  def topK(model: IvfModel, assigned: DataFrame, queries: DataFrame,
           queryId: Column, queryVec: Column, k: Int, nprobe: Int,
           excludeSelf: Boolean = true): DataFrame = {
    val probes = queries
      .select(queryId.as("query_id"), queryVec.as("qv"),
        explode(Kernels.topCentroidsCol(queryVec, model.matrix, nprobe))
          .as("list_id"))
    val candsAll = assigned.join(probes, Seq("list_id"))
    val cands = if (excludeSelf)
      candsAll.filter(col("query_id") =!= col("vec_id")) else candsAll
    val scored = cands.select(col("query_id"), col("vec_id").as("neighbor_id"),
      VectorFunctions.cosine(col("qv"), col("v")).as("cosine"))
    Similarity.rankTopK(scored, k)
  }
}
