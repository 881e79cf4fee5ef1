package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  private def vecs = {
    import graft.TestSpark.spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("id", "v")
  }

  test("bruteForceTopK ranks by exact cosine, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, col("id"), col("v"),
      vecs.filter(col("id") === 1), col("id"), col("v"), k = 3)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(out.toSeq.sortBy(_._2).map(_._1) == Seq(2L, 3L, 4L))
  }

  test("srpBucketTopK finds the co-bucketed near neighbor with full probes") {
    // probes = bits means every 1-bit-flip bucket is probed -> for 2D
    // vectors the true neighbor is recovered
    val out = Similarity.srpBucketTopK(vecs, col("id"), col("v"),
      vecs.filter(col("id") === 1), col("id"), col("v"), k = 1, dim = 2,
      bits = 4, probes = 4)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))
    assert(out.nonEmpty && out.head._1 == 2L)
  }

  test("probes parameter bounds the probe-bucket count") {
    import graft.functions.VectorFunctions
    val q = vecs.filter(col("id") === 1)
    // with probes=0 only the home bucket is probed; result is a subset of
    // the probes=4 result
    val p0 = Similarity.srpBucketTopK(vecs, col("id"), col("v"), q, col("id"),
      col("v"), k = 3, dim = 2, bits = 4, probes = 0).count()
    val p4 = Similarity.srpBucketTopK(vecs, col("id"), col("v"), q, col("id"),
      col("v"), k = 3, dim = 2, bits = 4, probes = 4).count()
    assert(p0 <= p4)
  }

  test("cosine matches hand-computed value") {
    import graft.functions.VectorFunctions
    import graft.TestSpark.spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosine(col("a"), col("b"))).head().getDouble(0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(c - expected) < 1e-12)
  }

  test("normalize yields unit-norm vectors") {
    import graft.functions.VectorFunctions
    import graft.TestSpark.spark.implicits._
    val df = Seq(Array(3.0, 4.0)).toDF("v")
    val n = df.select(VectorFunctions.norm2(
      VectorFunctions.normalize(col("v")))).head().getDouble(0)
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("integer cosine verdicts agree with exact BigInt rational " +
      "arithmetic on randomized vectors, including magnitudes that " +
      "need far more than 64 bits mid-comparison") {
    import graft.TestSpark.spark.implicits._
    val rnd = new scala.util.Random(42)
    // mixed magnitudes: small, centered-signature-sized (~1e6), and
    // near the documented Σv² ≤ 1e19/tDen contract bound — where the
    // dot/norms still fit a long but their squared products push the
    // decimal(38,0) comparison close to its 1e38 ceiling
    val vecs = (0 until 60).map { i =>
      val scale = Seq(10L, 1000000L, 100000000L)(i % 3)
      (i.toLong, Seq.fill(9)((rnd.nextLong() % scale)))
    }.toDF("id", "v")
    val tNum = 95L; val tDen = 100L
    val got = Similarity.integerCosinePairs(vecs, col("id"), col("v"),
        tNum, tDen, bits = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    val byId = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.size == 60 * 59 / 2)
    got.foreach { case ((ia, ib), (dot, verdict)) =>
      val a = byId(ia).map(BigInt(_)); val b = byId(ib).map(BigInt(_))
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum
      val nb = b.map(x => x * x).sum
      // dot column is the exact long dot product (these magnitudes are
      // chosen to keep the DOT itself in range; only its square is not)
      assert(BigInt(dot) == d, s"($ia,$ib): dot $dot != $d")
      // verdict == cos(a,b) >= tNum/tDen decided as an exact rational
      // comparison (cross-multiplied squares) — no floats anywhere
      val want = d > 0 &&
        d * d * BigInt(tDen) * BigInt(tDen) >=
          BigInt(tNum) * BigInt(tNum) * na * nb
      assert(verdict == want, s"($ia,$ib): verdict $verdict != $want")
    }
  }
}
