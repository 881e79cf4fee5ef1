package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Kernels

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search") — the memory/shuffle-compression half of the ANN
  * stack. [[Ivf]] prunes WHICH vectors a query touches; PQ shrinks WHAT
  * each touched vector costs: the 64-float embedding (256 bytes) becomes
  * `m` small codes (m ints, m bytes once parquet bit-packs them), and
  * candidates are scored against the exact query via table lookups into
  * the codebooks (asymmetric distance) without ever reading the floats.
  *
  * At 100 TB this is the difference between shuffling the embedding
  * column through the candidate join and shuffling 8-byte codes — a
  * ~30× reduction of the ANN working set, which is why every production
  * vector store pairs coarse pruning with PQ-compressed rerank.
  *
  * All per-row steps (encode, ADC score) are codegen kernels over the
  * broadcast codebooks ([[Kernels.pqEncodeCol]] /
  * [[Kernels.pqAdcScoreCol]]): no shuffle, no row inflation. The fit is
  * the same BOUNDED driver-side sample k-means as [[Ivf.fit]] (the model
  * IS an m × k × subdim matrix — kilobytes); see that scaladoc for why a
  * sampled fit is the scale-correct shape.
  */
object Pq {

  /** m subspace codebooks, each k codewords of dim/m entries, trained on
    * L2-NORMALIZED vectors ([[Kernels.pqEncode]] normalizes before
    * encoding, so the contract holds corpus-side automatically).
    */
  case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks(0).length
    def subdim: Int = codebooks(0)(0).length
  }

  /** Fit m × k codebooks by per-subspace Lloyd k-means (plain L2 — the
    * vectors are pre-normalized, subvectors are NOT renormalized: a
    * subvector's length carries real information about how the vector
    * distributes mass across subspaces). Deterministic: seeded
    * distinct-point init per subspace, parallel assignment into
    * preallocated slots, sequential accumulation — same discipline as
    * [[Ivf.fit]]. Sample capped by UNIFORM thinning, never limit()
    * (see Ivf.fit's scaladoc for the clustered-layout failure mode).
    */
  def fit(corpus: DataFrame, vec: Column, m: Int = 8, k: Int = 16,
          seed: Long = 42L, maxSample: Int = 25000,
          maxIter: Int = 10): PqModel = {
    require(m > 0 && k > 1, s"need m > 0 subspaces, k > 1 codewords: $m, $k")
    // placement-independent sample + deterministic driver order — the
    // same (hash-threshold select, sort by (hash, vector)) rule as
    // Ivf.fit (r18): the realized codebooks are a pure function of
    // (data, seed), not of partitioning or core count
    val vecs = corpus.select(vec.cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val n = vecs.count()
    require(n > 0, "Pq.fit: empty sample")
    val hashMod = 1L << 40
    val p = math.min(1.0, maxSample * 1.1 / n.toDouble)
    val hashed = vecs.select(col("v"),
      pmod(xxhash64(col("v"), lit(seed)), lit(hashMod)).as("__h"))
    val sampled =
      if (p >= 1.0) hashed
      else hashed.filter(col("__h") < lit(math.round(p * hashMod)))
    val collected: Array[(Long, Array[Double])] = sampled.collect()
      .map(r => (r.getLong(1), r.getSeq[Double](0).toArray))
    java.util.Arrays.sort(collected, Ivf.sampleOrder)
    val raw: Array[Array[Double]] = collected.take(maxSample).map(_._2)
    require(raw.nonEmpty, "Pq.fit: empty sample")
    val dim = raw(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subdim = dim / m
    // normalize the sample once — the encode kernel normalizes the same way
    val pts = raw.map { p =>
      var s = 0.0; var i = 0
      while (i < p.length) { s += p(i) * p(i); i += 1 }
      val norm = math.sqrt(s)
      if (norm > 0) { i = 0; while (i < p.length) { p(i) /= norm; i += 1 } }
      p
    }
    val codebooks = Array.tabulate(m) { j =>
      val off = j * subdim
      val sub = pts.map(p => java.util.Arrays.copyOfRange(p, off, off + subdim))
      lloyd(sub, math.min(k, sub.length), seed + j, maxIter)
    }
    PqModel(codebooks)
  }

  private def lloyd(pts: Array[Array[Double]], k: Int, seed: Long,
                    maxIter: Int): Array[Array[Double]] = {
    val dim = pts(0).length
    val rnd = new java.util.Random(seed)
    val cents = rnd.ints(0, pts.length).distinct().limit(k.toLong)
      .toArray.map(i => pts(i).clone())
    val assign = new Array[Int](pts.length)
    var iter = 0
    while (iter < maxIter) {
      java.util.stream.IntStream.range(0, pts.length).parallel().forEach { i =>
        var best = 0; var bestD = Double.PositiveInfinity; var c = 0
        while (c < cents.length) {
          var d = 0.0; var t = 0
          val ce = cents(c); val p = pts(i)
          while (t < dim) { val df = p(t) - ce(t); d += df * df; t += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
      }
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Int](cents.length)
      var i = 0
      while (i < pts.length) {
        val a = assign(i); val p = pts(i); val s = sums(a)
        var t = 0
        while (t < dim) { s(t) += p(t); t += 1 }
        counts(a) += 1; i += 1
      }
      var c = 0
      while (c < cents.length) {
        // empty cluster keeps its codeword so every code stays meaningful
        if (counts(c) > 0) {
          var t = 0
          while (t < dim) { cents(c)(t) = sums(c)(t) / counts(c); t += 1 }
        }
        c += 1
      }
      iter += 1
    }
    cents
  }

  /** Corpus write path: IVF list assignment + PQ codes in ONE narrow
    * pass — two per-row kernels over broadcast models, zero exchange,
    * and the output row is (int, id, m ints): this is what the 100-TB
    * index actually stores (partition by list_id, drop the floats).
    */
  def assignEncode(ivf: Ivf.IvfModel, pq: PqModel, corpus: DataFrame,
                   id: Column, vec: Column): DataFrame =
    corpus.select(
      Kernels.nearestCentroidCol(vec, ivf.matrix).as("list_id"),
      id.as("vec_id"),
      Kernels.pqEncodeCol(vec, pq.codebooks).as("codes"))

  /** IVF-PQ top-k: probe `nprobe` lists per query (per-row kernel on the
    * query side), equi-join on list_id against the CODE table — the
    * candidate stream carries m ints per row, never the embedding — and
    * rank by ADC score. `cosine` in the output is the ADC approximation
    * (exact query × quantized corpus); a production pipeline wanting
    * exact final scores reranks the k survivors against the float table
    * — k rows per query, noise at scale.
    */
  def topK(ivf: Ivf.IvfModel, pq: PqModel, encoded: DataFrame,
           queries: DataFrame, queryId: Column, queryVec: Column,
           k: Int, nprobe: Int, excludeSelf: Boolean = true): DataFrame = {
    val probes = queries
      .select(queryId.as("query_id"), queryVec.as("qv"),
        explode(Kernels.topCentroidsCol(queryVec, ivf.matrix, nprobe))
          .as("list_id"))
    val candsAll = encoded.join(probes, Seq("list_id"))
    val cands = if (excludeSelf)
      candsAll.filter(col("query_id") =!= col("vec_id")) else candsAll
    val scored = cands.select(col("query_id"),
      col("vec_id").as("neighbor_id"),
      Kernels.pqAdcScoreCol(col("qv"), col("codes"), pq.codebooks)
        .as("cosine"))
    Similarity.rankTopK(scored, k)
  }

  /** The production retrieval shape: ADC-rank `k × candidateFactor`
    * candidates from the code table, then rerank ONLY those survivors
    * against the float table and keep the exact top k. The float join
    * touches k·factor rows per query — noise at scale — while the
    * corpus-wide candidate stream still moves m-byte codes. Exact
    * scores in the output, quantization error reduced to a recall
    * (not ranking) effect within the probed lists.
    */
  def topKReranked(ivf: Ivf.IvfModel, pq: PqModel, encoded: DataFrame,
                   vectors: DataFrame, vecId: Column, vec: Column,
                   queries: DataFrame, queryId: Column, queryVec: Column,
                   k: Int, nprobe: Int,
                   candidateFactor: Int = 4): DataFrame = {
    require(candidateFactor >= 1, s"candidateFactor >= 1: $candidateFactor")
    val approx = topK(ivf, pq, encoded, queries, queryId, queryVec,
      k * candidateFactor, nprobe)
      .select(col("query_id"), col("neighbor_id"))
    val scored = approx
      .join(vectors.select(vecId.as("neighbor_id"), vec.as("__nv")),
        Seq("neighbor_id"))
      .join(queries.select(queryId.as("query_id"), queryVec.as("__qv")),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorFunctions.cosine(col("__qv"), col("__nv"))
          .as("cosine"))
    Similarity.rankTopK(scored, k)
  }
}
