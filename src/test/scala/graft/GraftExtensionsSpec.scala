package graft

import org.apache.spark.sql.functions._

import graft.functions.{Fnv64, Kernels, VectorFunctions}

class GraftExtensionsSpec extends SparkTestBase {

  test("SQL users reach the kernels after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_fnv64('hello') AS h,
        |  graft_simhash64(split('a b c', ' ')) AS sh,
        |  size(graft_minhash(array('x y z', 'y z w'), 16, 42)) AS msize,
        |  size(graft_winnow('abcdefgh', 5, 2)) AS wsize,
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        |  graft_srp_code(array(1.0D, 2.0D), 2, 4, 42) AS srp
        |""".stripMargin).head()
    assert(r.getAs[Long]("h") == Fnv64.hash("hello"))
    assert(r.getAs[Int]("msize") == 16)
    assert(r.getAs[Int]("wsize") >= 1)
    assert(r.getAs[Double]("cos") == 1.0)
  }

  test("kernel cosine is bit-identical to the declarative HOF form") {
    import graft.TestSpark.spark.implicits._
    val floats = Seq(
      (Array(0.1f, -0.7f, 0.33f), Array(0.9f, 0.2f, -0.5f)),
      (Array(1e-8f, 2e8f, 3f), Array(4f, -5e-6f, 6e6f))).toDF("a", "b")
    val both = floats.select(
      VectorFunctions.cosine(col("a"), col("b")).as("k"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("h")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    val doubles = Seq((Array(0.1, 0.2, 0.3), Array(-0.4, 0.5, 0.6))).toDF("a", "b")
    val r2 = doubles.select(
      VectorFunctions.cosine(col("a"), col("b")).as("k"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("h")).head()
    assert(java.lang.Double.doubleToLongBits(r2.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r2.getDouble(1)))
  }
}
