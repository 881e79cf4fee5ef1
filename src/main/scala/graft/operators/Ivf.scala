package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

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
  * At scale the corpus assignment is write-once (store `list_id` as a
  * partition column) and queries touch nprobe/nlist of the data — the
  * candidate generation is an equi-join on list_id, never a cross join.
  */
object Ivf {

  /** Model = the centroid table, small enough to broadcast (nlist rows). */
  case class IvfModel(centroids: DataFrame /* (list_id, centroid) */)

  /** Fit nlist centroids. `sampleFraction` bounds the driver-side k-means
    * input at scale (k-means itself is iterative Spark jobs, fine; the
    * sample bounds its cost).
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
    val rows = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
    IvfModel(rows.toDF("list_id", "centroid"))
  }

  /** Assign each corpus row to its nearest centroid (one broadcast join +
    * one window — no shuffle of the corpus beyond the rank partitioning;
    * at scale this is the write-path that produces list-partitioned
    * storage).
    */
  def assign(model: IvfModel, corpus: DataFrame, id: Column,
             vec: Column): DataFrame = {
    val scored = corpus.select(id.as("vec_id"), vec.as("v"))
      .crossJoin(broadcast(model.centroids))
      .withColumn("dist2", negate(VectorFunctions.cosine(col("v"), col("centroid"))))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist2").asc, col("list_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("list_id"))
  }

  /** ANN top-k: probe the `nprobe` closest lists per query, rerank
    * exactly. Candidate generation = equi-join on list_id.
    */
  def topK(model: IvfModel, assigned: DataFrame, queries: DataFrame,
           queryId: Column, queryVec: Column, k: Int, nprobe: Int,
           excludeSelf: Boolean = true): DataFrame = {
    val qc = queries.select(queryId.as("query_id"), queryVec.as("qv"))
      .crossJoin(broadcast(model.centroids))
      .withColumn("sim", VectorFunctions.cosine(col("qv"), col("centroid")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("list_id").asc)
    val probes = qc.withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("list_id"))
    val candsAll = assigned.join(probes, Seq("list_id"))
    val cands = if (excludeSelf)
      candsAll.filter(col("query_id") =!= col("vec_id")) else candsAll
    val scored = cands.select(col("query_id"), col("vec_id").as("neighbor_id"),
      VectorFunctions.cosine(col("qv"), col("v")).as("cosine"))
    Similarity.rankTopK(scored, k)
  }
}
