package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VectorSumAggSpec extends SparkTestBase {

  test("group mean embedding equals the hand-computed centroid") {
    import graft.TestSpark.spark.implicits._
    val vecs = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 4.0f)),
      ("b", Array(10.0f, 0.0f))).toDF("grp", "v")
    val m = vecs.groupBy("grp")
      .agg(VectorSumAgg.meanVector(col("v"), 2).as("centroid"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(m("a") == Seq(2.0, 3.0))
    assert(m("b") == Seq(10.0, 0.0))
  }

  test("vectorSumQuantized sums floor(x*scale + 0.5) micro-units exactly") {
    import graft.TestSpark.spark.implicits._
    // 1.25 -> 13, -0.35 -> -3 (floor(-3.5+0.5)), 0.04 -> 0, 2.06 -> 21
    val vecs = Seq(
      ("a", Array(1.25f, -0.35f)), ("a", Array(0.04f, 2.06f))).toDF("grp", "v")
    val m = vecs.groupBy("grp")
      .agg(VectorSumAgg.vectorSumQuantized(col("v"), 2, 10.0).as("qsum"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(m("a") == Seq(13.0, 18.0), m.toString) // 13+0, -3+21
  }

  test("vector sum rejects non-vector input at analysis") {
    import graft.TestSpark.spark.implicits._
    val df = Seq(("a", "x")).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(VectorSumAgg.vectorSum(col("v"), 2)).collect()
    }
    assert(e.getMessage.contains("requires array<float|double>"), e.getMessage)
  }

  test("centroid of the harness embeddings per label is finite and sized") {
    val embs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = embs.groupBy("label")
      .agg(VectorSumAgg.meanVector(col("embedding"), 64).as("centroid"))
      .collect()
    assert(cents.nonEmpty)
    cents.foreach { r =>
      val c = r.getSeq[Double](1)
      assert(c.length == 64 && c.forall(x => !x.isNaN && !x.isInfinite))
    }
  }

  test("dim mismatch fails loudly, not with a skewed centroid") {
    import graft.TestSpark.spark.implicits._
    val df = Seq(("a", Array(1.0, 2.0, 3.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(VectorSumAgg.vectorSum(col("v"), 2)).collect()
    }
    assert(e.getMessage.contains("got a vector of length 3"), e.getMessage)
  }
}
