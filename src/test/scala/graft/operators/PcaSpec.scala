package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  // 2-dimensional vectors for hand-checkable moments
  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("gramTriangle matches hand-computed quantized sums") {
    // quantized at scale 10: (10, 20), (30, 40)
    val df = vecs(1L -> Seq(1.0, 2.0), 2L -> Seq(3.0, 4.0))
    val got = Pca.gramTriangle(df, col("embedding"), dim = 2, scale = 10.0)
      .orderBy("i", "j").as[(Int, Int, Long, Long)].collect()
    // s11 = 100 + 900, s12 = 200 + 1200, s22 = 400 + 1600
    assert(got.toSeq == Seq((1, 1, 1000L, 2L), (1, 2, 1400L, 2L),
      (2, 2, 2000L, 2L)))
  }

  test("gram triangle is invariant to partitioning (exact integer sums)") {
    val rows = (1 to 50).map(i => (i.toLong, Seq(i * 0.1, 1.0 - i * 0.01, 0.5)))
    val one = Pca.gramTriangle(vecs(rows: _*).repartition(1),
      col("embedding"), dim = 3).orderBy("i", "j").collect()
    val many = Pca.gramTriangle(vecs(rows: _*).repartition(7),
      col("embedding"), dim = 3).orderBy("i", "j").collect()
    assert(one.toSeq == many.toSeq)
  }

  test("jacobiEigen recovers a known spectrum") {
    // eigenvalues 3 and 1, eigenvectors (1,1)/√2 and (1,-1)/√2
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (values, vectors) = Pca.jacobiEigen(m)
    val sorted = values.sorted.reverse
    assert(math.abs(sorted(0) - 3.0) < 1e-12)
    assert(math.abs(sorted(1) - 1.0) < 1e-12)
    // eigenvector for λ=3 is ±(1,1)/√2: components equal in magnitude
    val hi = values.indexOf(values.max)
    assert(math.abs(math.abs(vectors(0)(hi)) - math.abs(vectors(1)(hi))) < 1e-12)
  }

  test("fit finds the dominant axis of an anisotropic cloud") {
    // points spread along (1, 1, 0): variance concentrated on that axis
    val rows = (-20 to 20).map { i =>
      (i.toLong + 21, Seq(i * 0.1, i * 0.1 + 0.001 * (i % 3), 0.01 * (i % 5)))
    }
    val model = Pca.fit(vecs(rows: _*), col("embedding"), dim = 3, k = 3)
    val c0 = model.components(0)
    // dominant axis ∝ (1, 1, 0); sign pinned positive
    assert(math.abs(c0(0) - c0(1)) < 0.01 && math.abs(c0(2)) < 0.05)
    assert(c0(0) > 0)
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    assert(model.eigenvalues(1) >= model.eigenvalues(2))
    // components orthonormal
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(c0, c0) - 1.0) < 1e-9)
    assert(math.abs(dot(c0, model.components(1))) < 1e-9)
  }

  test("projected component variances match the eigenvalues in order") {
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq(math.sin(i * 0.7) * 2.0, math.cos(i * 1.3) * 0.5,
        math.sin(i * 2.9) * 0.1 + math.sin(i * 0.7)))
    }
    val df = vecs(rows: _*)
    val model = Pca.fit(df, col("embedding"), dim = 3, k = 3)
    val proj = Pca.project(model, df, col("embedding"))
    val stats = proj.select(
      (1 to 3).flatMap(c => Seq(
        sum(element_at(col("pca"), c)).as(s"s$c"),
        sum(element_at(col("pca"), c) * element_at(col("pca"), c)).as(s"q$c"))): _*)
      .head()
    val n = 200.0
    val vars = (0 until 3).map { c =>
      val s = stats.getDouble(2 * c); val q = stats.getDouble(2 * c + 1)
      (q - s * s / n) / (n - 1)
    }
    // sample variance along eigenvector c equals eigenvalue c (up to the
    // 1e-6 quantization of the moment pass)
    vars.zip(model.eigenvalues).foreach { case (v, ev) =>
      assert(math.abs(v - ev) < 1e-4 + 1e-3 * math.abs(ev), s"$v vs $ev")
    }
    assert(vars(0) >= vars(1) && vars(1) >= vars(2))
  }

  test("whiten yields unit-variance axes and drops dead directions") {
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq(math.sin(i * 0.7) * 3.0, math.cos(i * 1.3) * 0.2, 0.0))
    }
    val df = vecs(rows: _*)
    val model = Pca.fit(df, col("embedding"), dim = 3, k = 3)
    // the constant third axis has ~zero eigenvalue -> dropped
    val white = Pca.whiten(model, df, col("embedding"))
    val width = white.select(size(col("pca_white"))).as[Int].head()
    assert(width == 2, s"expected dead axis dropped, got width $width")
    val stats = white.select(
      (1 to 2).flatMap(c => Seq(
        sum(element_at(col("pca_white"), c)).as(s"s$c"),
        sum(element_at(col("pca_white"), c) * element_at(col("pca_white"), c)).as(s"q$c"))): _*)
      .head()
    (0 until 2).foreach { c =>
      val s = stats.getDouble(2 * c); val q = stats.getDouble(2 * c + 1)
      val v = (q - s * s / 200.0) / 199.0
      assert(math.abs(v - 1.0) < 1e-3, s"axis $c variance $v")
    }
  }

  test("fit is deterministic across partitionings") {
    val rows = (1 to 100).map(i => (i.toLong, Seq(i * 0.01, (101 - i) * 0.02)))
    val a = Pca.fit(vecs(rows: _*).repartition(1), col("embedding"), 2, 2)
    val b = Pca.fit(vecs(rows: _*).repartition(8), col("embedding"), 2, 2)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
  }

  test("wrong-length vectors fail loudly in gram and project") {
    val bad = vecs(1L -> Seq(1.0, 2.0, 3.0))
    val ex = intercept[Exception] {
      Pca.gramTriangle(bad, col("embedding"), dim = 2).collect()
    }
    assert(ex.getMessage.contains("length") ||
      ex.getCause != null && ex.getCause.getMessage.contains("length"))
    val model = Pca.Model(2, Array(0.0, 0.0),
      Array(Array(1.0, 0.0)), Array(1.0))
    val ex2 = intercept[Exception] {
      Pca.project(model, bad, col("embedding")).collect()
    }
    assert(ex2.getMessage.contains("length") ||
      ex2.getCause != null && ex2.getCause.getMessage.contains("length"))
  }

  test("gram overflow guard fails loudly instead of wrapping around") {
    // quantScale large enough that |q| busts the 3e9 magnitude cap
    val df = vecs(1L -> Seq(1.0e9, 0.0))
    val ex = intercept[Exception] {
      Pca.gramTriangle(df, col("embedding"), dim = 2, scale = 1e6).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("overflow guard")), ex.toString)
  }

  test("float input vectors are accepted (the embeddings table's type)") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val got = Pca.gramTriangle(df, col("embedding"), dim = 2, scale = 10.0)
      .orderBy("i", "j").as[(Int, Int, Long, Long)].collect()
    assert(got.map(_._3).toSeq == Seq(1000L, 1400L, 2000L))
    val model = Pca.fit(df, col("embedding"), dim = 2, k = 1)
    assert(Pca.project(model, df, col("embedding")).count() == 2)
  }
}
