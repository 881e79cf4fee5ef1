package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Distributed Lloyd k-means ([[Ivf.fitDistributed]]): cluster recovery
  * on separated data, spherical invariants, empty-list retention, and
  * partitioning-independence (exact on integer-valued coordinates, where
  * double summation is order-independent).
  */
class KmeansSpec extends SparkTestBase {

  // three well-separated direction clusters in 4-dim: members of each
  // cluster point along one axis with small integral jitter on another
  private def clustered = {
    import graft.TestSpark.spark.implicits._
    val rows = (0 until 30).map { i =>
      val g = i % 3
      val base = Array(0.0, 0.0, 0.0, 0.0)
      base(g) = 10.0
      base((g + 1) % 4) = (i / 3 % 3).toDouble // jitter 0,1,2
      (i.toLong, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("fitDistributed recovers separated clusters and assigns consistently") {
    val df = clustered
    val model = Ivf.fitDistributed(df, col("vec_id"), col("embedding"),
      nlist = 3, maxIter = 10, seed = 7L)
    assert(model.matrix.length == 3)
    // spherical: every centroid unit-norm
    model.matrix.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"non-unit centroid norm $n")
    }
    val assigned = Ivf.assign(model, df, col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // every ground-truth group lands in ONE list, and the three groups
    // land in three different lists
    val groups = (0 until 3).map { g =>
      (0 until 30).filter(_ % 3 == g).map(i => assigned(i.toLong)).distinct
    }
    groups.foreach(ls => assert(ls.size == 1, s"split cluster: $groups"))
    assert(groups.flatten.distinct.size == 3, s"merged clusters: $groups")
  }

  test("fitDistributed is exact-deterministic across partitionings " +
    "on integral coordinates") {
    val df = clustered
    val a = Ivf.fitDistributed(df.repartition(1), col("vec_id"),
      col("embedding"), nlist = 3, maxIter = 5, seed = 7L).matrix
    val b = Ivf.fitDistributed(df.repartition(7), col("vec_id"),
      col("embedding"), nlist = 3, maxIter = 5, seed = 7L).matrix
    // quantized sums are exact integral doubles → identical bits
    // regardless of partition/summation order; init is md5-ranked →
    // layout-free
    assert(a.length == b.length)
    a.zip(b).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
  }

  test("quantScale makes the fit bit-reproducible across partitionings " +
    "on arbitrary FLOAT coordinates too") {
    import graft.TestSpark.spark.implicits._
    // non-integral, non-dyadic coordinates: raw double summation order
    // would differ at ulp level across partitionings; quantization
    // makes the update sums exact integers
    val rows = (0 until 60).map { i =>
      val g = i % 3
      val base = Array.fill(4)(0.1 + (i % 7) * 0.3 / 7.0)
      base(g) = 10.0 + i * 0.01
      (i.toLong, base.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val a = Ivf.fitDistributed(df.repartition(1), col("vec_id"),
      col("embedding"), nlist = 3, maxIter = 6, seed = 7L).matrix
    val b = Ivf.fitDistributed(df.repartition(11), col("vec_id"),
      col("embedding"), nlist = 3, maxIter = 6, seed = 7L).matrix
    a.zip(b).foreach { case (ca, cb) =>
      assert(ca.sameElements(cb), "quantized fit diverged across layouts")
    }
  }

  test("fitDistributed keeps every list populated when nlist exceeds " +
    "natural cluster count (empty list retains its init centroid)") {
    import graft.TestSpark.spark.implicits._
    // 8 identical points: all collapse onto one centroid; the other
    // lists must keep valid (finite) centroids rather than NaN out
    val df = (0 until 8).map(i => (i.toLong, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val model = Ivf.fitDistributed(df, col("vec_id"), col("embedding"),
      nlist = 4, maxIter = 3, seed = 1L)
    assert(model.matrix.length == 4)
    model.matrix.foreach(c => assert(c.forall(x => !x.isNaN)))
    val assigned = Ivf.assign(model, df, col("vec_id"), col("embedding"))
      .select(col("list_id")).distinct().collect()
    assert(assigned.length == 1) // identical points, one list
  }

  test("fitDistributed converges early under tol and caps nlist at n") {
    import graft.TestSpark.spark.implicits._
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    // nlist > rows: model must cap at the 2 available points
    val model = Ivf.fitDistributed(df, col("vec_id"), col("embedding"),
      nlist = 5, maxIter = 10, seed = 3L)
    assert(model.matrix.length == 2)
    // separated unit points are an immediate fixpoint: assignment stable
    val counts = Ivf.assign(model, df, col("vec_id"), col("embedding"))
      .groupBy(col("list_id")).count().collect()
    assert(counts.length == 2 && counts.forall(_.getLong(1) == 1L))
  }
}
