package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GramSumAgg, Kernels, VectorSumAgg}

/** PCA over an embedding column — the standard pre-conditioning step a
  * large-scale embedding pipeline runs before clustering or ANN
  * (SemDeDup's k-means and IVF's coarse quantizer both improve on
  * decorrelated, variance-ranked axes; dropping trailing components is
  * the cheapest dimensionality cut that preserves L2 geometry).
  *
  * Scale shape — the moment-matrix pattern, NOT a row shuffle: the fit
  * reduces the corpus to one dim·(dim+1)/2 packed Gram triangle plus a
  * dim-length mean sum via map-side-combining typed aggregates
  * ([[graft.functions.GramSumAgg]] / [[graft.functions.VectorSumAgg]]),
  * so a 1000-executor scan ships ~16 KiB per task and the
  * eigendecomposition runs on the driver over a dim × dim matrix —
  * O(dim³) once, independent of row count. Projection is a per-row
  * codegen kernel ([[graft.functions.Kernels.projectDense]]): zero
  * shuffle, k × dim fused multiply-adds inside WholeStageCodegen.
  *
  * Exactness: the Gram triangle sums floor(x·scale + 0.5)-quantized
  * integer products as longs — exact and order-independent on any
  * partitioning, which is what makes the moment pass oracle-checkable
  * against another engine ([[gramTriangle]] backs the `pca_gram` oracle
  * query). The fit itself divides those exact integers into doubles; the
  * Jacobi rotation loop is plain IEEE arithmetic and deterministic for a
  * given triangle, so [[fit]] is reproducible run-to-run bit-for-bit.
  */
object Pca {

  /** Fitted transform: `mean` for centering, `components(c)(i)` the c-th
    * principal axis (rows are unit eigenvectors, eigenvalue-descending),
    * `eigenvalues` the matching covariance eigenvalues (variance along
    * each axis).
    */
  final case class Model(dim: Int, mean: Array[Double],
                         components: Array[Array[Double]],
                         eigenvalues: Array[Double]) {
    require(components.length == eigenvalues.length,
      "components/eigenvalues length mismatch")
  }

  /** The exact integer moment pass as a queryable frame: one row per
    * upper-triangle cell (1-based `i` <= `j`) with the quantized product
    * sum — engine-portable by construction (integral products, long
    * sums). `n_rows` rides every row so the consumer can turn sums into
    * covariance without a second scan.
    */
  def gramTriangle(df: DataFrame, vec: Column, dim: Int,
                   scale: Double = 1e6): DataFrame = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    val tri = dim * (dim + 1) / 2
    // flat upper-triangle index -> (i, j), materialized as literal lookup
    // arrays (tiny: tri ints) so the explode needs no join and no sqrt
    val iIdx = new Array[Int](tri)
    val jIdx = new Array[Int](tri)
    var k = 0
    for (i <- 1 to dim; j <- i to dim) { iIdx(k) = i; jIdx(k) = j; k += 1 }
    df.agg(
        GramSumAgg.gramSumQuantized(vec, dim, scale).as("qgram"),
        count(lit(1)).as("n_rows"))
      .select(col("n_rows"), posexplode(col("qgram")).as(Seq("pos", "qsum")))
      .select(
        element_at(typedLit(iIdx.toSeq), col("pos") + 1).as("i"),
        element_at(typedLit(jIdx.toSeq), col("pos") + 1).as("j"),
        col("qsum"), col("n_rows"))
  }

  /** Fit a k-component PCA: one aggregate pass (exact quantized Gram +
    * double mean sum + count), then a driver-side Jacobi
    * eigendecomposition of the dim × dim covariance. Deterministic: the
    * triangle is exact on any partitioning and the eigenvector sign is
    * pinned (largest-magnitude element positive, ties to the earlier
    * index).
    */
  def fit(df: DataFrame, vec: Column, dim: Int, k: Int,
          scale: Double = 1e6): Model = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]: $k")
    // the mean sum is quantized too: an unquantized double sum is
    // order-dependent across partitionings, which would break the
    // bit-for-bit determinism this fit promises (micro-unit rounding of
    // the mean is noise next to the covariance's own quantization)
    val row = df.agg(
      GramSumAgg.gramSumQuantized(vec, dim, scale).as("qgram"),
      VectorSumAgg.vectorSumQuantized(vec, dim, scale).as("qsum"),
      count(lit(1)).as("n")).head()
    val qgram = row.getSeq[Long](0)
    val qsum = row.getSeq[Double](1)
    val n = row.getLong(2)
    require(n >= 2, s"PCA fit needs at least 2 rows, got $n")
    val mean = qsum.map(_ / scale / n).toArray
    // covariance from exact moments: E[xy] − E[x]E[y], scaled to n/(n−1)
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 0
    val s2 = scale * scale
    for (i <- 0 until dim; j <- i until dim) {
      val exy = qgram(idx) / s2 / n
      val c = (exy - mean(i) * mean(j)) * n / (n - 1)
      cov(i)(j) = c; cov(j)(i) = c
      idx += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // eigenvalue-descending order, ties to the lower original index
    val order = values.indices.sortBy(i => (-values(i), i))
    val comps = order.take(k).map { c =>
      val v = vectors.map(_(c))
      // sign pin: largest-|.| element positive (earlier index on ties)
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    Model(dim, mean, comps, order.take(k).map(values).toArray)
  }

  /** Project rows onto the fitted axes: appends `outCol` =
    * array<double> of k centered dot products via the codegen kernel —
    * zero shuffle, model broadcast inside the generated code's
    * references.
    */
  def project(model: Model, df: DataFrame, vec: Column,
              outCol: String = "pca"): DataFrame =
    df.withColumn(outCol,
      Kernels.projectDenseCol(vec, model.mean, model.components))

  /** Whitened projection: each component divided by √eigenvalue, so the
    * output axes have unit variance — the standard pre-conditioning
    * before cosine/L2 clustering when raw axes differ by orders of
    * magnitude. Components with eigenvalue <= `eps` (numerically dead
    * directions) are dropped rather than amplified: dividing by a
    * near-zero √λ would turn quantization noise into the dominant axis.
    * Same zero-shuffle kernel as [[project]] — the scaling folds into
    * the component matrix on the driver.
    */
  def whiten(model: Model, df: DataFrame, vec: Column,
             outCol: String = "pca_white", eps: Double = 1e-9): DataFrame = {
    val keep = model.eigenvalues.zipWithIndex.filter(_._1 > eps).map(_._2)
    require(keep.nonEmpty,
      s"whiten: every eigenvalue is <= $eps — nothing to project onto")
    val scaled = keep.map { c =>
      val s = 1.0 / math.sqrt(model.eigenvalues(c))
      model.components(c).map(_ * s)
    }
    df.withColumn(outCol,
      Kernels.projectDenseCol(vec, model.mean, scaled))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS, matching
    * value order). O(sweeps · dim³); converges quadratically — 30 sweeps
    * is far past machine precision for dim <= a few hundred, and the
    * off-diagonal norm check exits early (typically < 10 sweeps at
    * dim = 64).
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (sweep < 30 && off > 1e-14) {
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        if (math.abs(a(p)(q)) > 1e-300) {
          // classic two-sided rotation zeroing a(p)(q)
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) match {
            case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          var i = 0
          while (i < n) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
            i += 1
          }
          i = 0
          while (i < n) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
            i += 1
          }
          i = 0
          while (i < n) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
            i += 1
          }
        }
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    val n = a.length
    for (i <- 0 until n; j <- 0 until n if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
