package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SSL-prototype pruning ([[Diversify.sslPrototypePrune]]): exact drop
  * sets on a hand-built geometry, floor-count identity, tie-break
  * determinism, and the dropFrac edge cases.
  */
class DiversifySpec extends SparkTestBase {

  // two orthogonal clusters; within each, members at decreasing cosine
  // to the axis: the axis point itself is the prototype
  private def fixture = {
    import graft.TestSpark.spark.implicits._
    // cluster along x: ids 1-4 at angles 0° < 15° < 30° < 45°
    // cluster along y: ids 11-14, mirrored
    def ray(deg: Double, x: Boolean) = {
      val r = math.toRadians(deg)
      if (x) Seq(math.cos(r), math.sin(r), 0.0, 0.0)
      else Seq(math.sin(r), math.cos(r), 0.0, 0.0)
    }
    Seq(
      (1L, ray(0, true)), (2L, ray(15, true)),
      (3L, ray(30, true)), (4L, ray(45, true)),
      (11L, ray(0, false)), (12L, ray(15, false)),
      (13L, ray(30, false)), (14L, ray(45, false))
    ).toDF("vec_id", "embedding")
  }

  private def model = {
    import graft.TestSpark.spark.implicits._
    // fixed axis centroids — the prune contract is relative to a GIVEN
    // model; Lloyd quality is KmeansSpec's business
    val mat = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    Ivf.IvfModel(
      Seq((0, mat(0).toSeq), (1, mat(1).toSeq)).toDF("list_id", "centroid"),
      mat)
  }

  test("sslPrototypePrune drops exactly the most-prototypical members " +
    "per cluster") {
    // dropFrac 0.5 on clusters of 4 → drop the 2 highest-cosine members
    // of each: ids 1,2 (x) and 11,12 (y)
    val kept = Diversify.sslPrototypePrune(fixture, col("vec_id"),
        col("embedding"), model, dropFrac = 0.5)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 13L, 14L))
  }

  test("floor identity: dropFrac that does not divide the cluster " +
    "size floors down") {
    // dropFrac 0.3 on n=4 → floor(1.2) = 1 drop per cluster (the axis
    // prototypes 1 and 11)
    val kept = Diversify.sslPrototypePrune(fixture, col("vec_id"),
        col("embedding"), model, dropFrac = 0.3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L, 12L, 13L, 14L))
    val prof = Diversify.prototypePruneProfile(fixture, col("vec_id"),
        col("embedding"), model, dropFrac = 0.3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(prof == Set((0, 4L, 3L, 1L), (1, 4L, 3L, 1L)))
  }

  test("ties break to the smaller id; dropFrac 0 is identity") {
    import graft.TestSpark.spark.implicits._
    // three IDENTICAL vectors in one cluster: cosine ties, rank by id
    val d = Seq((5L, Seq(1.0, 0.0, 0.0, 0.0)),
      (6L, Seq(1.0, 0.0, 0.0, 0.0)),
      (7L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val kept = Diversify.sslPrototypePrune(d, col("vec_id"),
        col("embedding"), model, dropFrac = 0.4)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(6L, 7L)) // floor(0.4·3)=1 → min id 5 drops
    val all = Diversify.sslPrototypePrune(d, col("vec_id"),
      col("embedding"), model, dropFrac = 0.0)
    assert(all.count() == 3)
  }

  test("composes with fitDistributed end-to-end and keeps every " +
    "cluster non-empty at moderate dropFrac") {
    val df = fixture
    val m = Ivf.fitDistributed(df, col("vec_id"), col("embedding"),
      nlist = 2, maxIter = 5, seed = 7L)
    val prof = Diversify.prototypePruneProfile(df, col("vec_id"),
        col("embedding"), m, dropFrac = 0.5)
      .collect()
    assert(prof.map(_.getLong(1)).sum == 8L)
    prof.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) / 2) // floor(0.5·n)
      assert(r.getLong(2) > 0L)
    }
  }
}
