package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CountMinSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private def tokens = Seq.fill(40)("hot") ++ Seq.fill(7)("warm") ++
    Seq("cold1", "cold2", "cold3")

  test("probe is consistent with the built-in count_min_sketch aggregate") {
    val sketch = tokens.toDF("term")
      .agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("cms"))
    val probes = Seq("hot", "warm", "cold1", "absent").toDF("q")
    val got = probes.crossJoin(sketch)
      .select(col("q"), Kernels.countMinEstimateCol(col("cms"), col("q")).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = Map("hot" -> 40L, "warm" -> 7L, "cold1" -> 1L, "absent" -> 0L)
    // CMS never under-counts; at width >> vocab the over-count bound
    // eps*N (0.001 * 50 < 1) forces exact equality here
    exact.foreach { case (k, v) =>
      assert(got(k) == v, s"$k: got ${got(k)} want $v")
    }
  }

  test("probe runs inside whole-stage codegen and memoizes the sketch") {
    val sketch = tokens.toDF("term")
      .agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("cms"))
    val df = spark.range(500).select(col("id").cast("string").as("q"))
      .crossJoin(sketch)
      .select(Kernels.countMinEstimateCol(col("cms"), col("q")).as("est"))
    assert(df.agg(sum("est")).head().getLong(0) == 0L) // none present
    df.collect() // settle AQE so the final plan below is the real one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("count_min_estimate"), plan)
    assert(plan.contains("*("), plan) // codegen'd stage
  }

  test("type checking rejects wrong inputs at analysis time") {
    val e = intercept[Exception] {
      Seq(1).toDF("x")
        .select(Kernels.countMinEstimateCol(col("x"), lit("a")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"), e.getMessage)
  }
}
