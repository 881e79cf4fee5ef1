package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{Kernels, VectorFunctions}
import graft.sources.Tables

class PqSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private val dir = "/root/testdata/sf0.001"

  test("codes are in range, deterministic, and self-codewords reconstruct exactly") {
    // 4 orthogonal-ish points, k = 4 codewords per subspace: after
    // convergence every sample point IS a codeword, so the ADC score of
    // a vector against its own codes equals cosine(v, v) = 1
    val pts = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 2f)))
    val df = pts.toDF("vec_id", "v")
    val model = Pq.fit(df, col("v"), m = 2, k = 4)
    assert(model.m == 2 && model.subdim == 2)
    val enc = df.select(col("vec_id"),
      Kernels.pqEncodeCol(col("v"), model.codebooks).as("codes"))
    val codes = enc.as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(c => c.length == 2 && c.forall(i => i >= 0 && i < 4)))
    // re-encoding is identical (kernel is a pure function of model+row)
    assert(enc.as[(Long, Seq[Int])].collect().toMap == codes)
    val selfScore = df
      .select(Kernels.pqAdcScoreCol(col("v"),
        Kernels.pqEncodeCol(col("v"), model.codebooks),
        model.codebooks).as("s"))
      .as[Double].collect()
    selfScore.foreach(s => assert(math.abs(s - 1.0) < 1e-9, s.toString))
  }

  test("ADC scores track exact cosine on real embeddings") {
    val embs = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 200)
    val model = Pq.fit(embs, col("embedding"), m = 8, k = 16)
    val scored = embs
      .select(col("vec_id"), col("embedding"),
        Kernels.pqEncodeCol(col("embedding"), model.codebooks).as("codes"))
      .crossJoin(broadcast(embs.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))))
      .select(
        VectorFunctions.cosine(col("qv"), col("embedding")).as("exact"),
        Kernels.pqAdcScoreCol(col("qv"), col("codes"), model.codebooks)
          .as("adc"))
    val err = scored.agg(avg(abs(col("exact") - col("adc")))).as[Double].head()
    // random 64-dim vectors quantized to 8×16 codes: mean absolute
    // cosine error well under the ~0.12 neighbor-gap at this sf
    assert(err < 0.1, s"mean |exact - adc| = $err")
  }

  test("IVF-PQ top-k recall floor on real embeddings") {
    val embs = Tables.load(spark, dir, "embeddings")
    val queries = embs.filter(col("vec_id") % 50 === 0)
    val ivf = Ivf.fit(embs, col("embedding"), nlist = 8)
    val pq = Pq.fit(embs, col("embedding"), m = 8, k = 16)
    val encoded = Pq.assignEncode(ivf, pq, embs, col("vec_id"), col("embedding"))
    // the candidate row layout really is codes-only (the scale claim)
    assert(encoded.columns.toSeq == Seq("list_id", "vec_id", "codes"))
    def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topkSet(Similarity.bruteForceTopK(embs, col("vec_id"),
      col("embedding"), queries, col("vec_id"), col("embedding"), k = 10))
    val got = topkSet(Pq.topK(ivf, pq, encoded, queries, col("vec_id"),
      col("embedding"), k = 10, nprobe = 4))
    val per = exact.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size }
    val recall = per.sum / per.size
    // IVF pruning + quantization noise on adversarial random vectors
    assert(recall >= 0.2, s"IVF-PQ recall $recall")
  }

  test("exact rerank recovers at least ADC's recall and emits exact scores") {
    val embs = Tables.load(spark, dir, "embeddings")
    val queries = embs.filter(col("vec_id") % 50 === 0)
    val ivf = Ivf.fit(embs, col("embedding"), nlist = 8)
    val pq = Pq.fit(embs, col("embedding"), m = 8, k = 16)
    val encoded = Pq.assignEncode(ivf, pq, embs, col("vec_id"), col("embedding"))
    def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topkSet(Similarity.bruteForceTopK(embs, col("vec_id"),
      col("embedding"), queries, col("vec_id"), col("embedding"), k = 10))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size }
      per.sum / per.size
    }
    val adc = recall(topkSet(Pq.topK(ivf, pq, encoded, queries,
      col("vec_id"), col("embedding"), k = 10, nprobe = 4)))
    val reranked = Pq.topKReranked(ivf, pq, encoded,
      embs, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"),
      k = 10, nprobe = 4, candidateFactor = 4)
    assert(recall(topkSet(reranked)) >= adc - 1e-9,
      "exact rerank of a candidate superset cannot lose recall")
    // survivors carry EXACT cosine: spot-check one row against the kernel
    val row = reranked.limit(1)
      .join(embs.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")), Seq("query_id"))
      .join(embs.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv")), Seq("neighbor_id"))
      .select(col("cosine"),
        VectorFunctions.cosine(col("qv"), col("nv")).as("truth"))
      .as[(Double, Double)].head()
    assert(math.abs(row._1 - row._2) < 1e-12)
  }

  test("edge contracts: zero query scores -1, corrupt codes clamp, bad dims rejected") {
    val df = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "v")
    val model = Pq.fit(df, col("v"), m = 2, k = 2)
    val zero = Seq((1L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "v")
      .select(Kernels.pqAdcScoreCol(col("v"),
        Kernels.pqEncodeCol(col("v"), model.codebooks),
        model.codebooks).as("s")).as[Double].head()
    assert(zero == -1.0)
    // out-of-range codes score against the clamped codeword, not throw
    val corrupt = Seq((Array(1f, 0f, 0f, 0f), Seq(99, -3)))
      .toDF("v", "codes")
      .select(Kernels.pqAdcScoreCol(col("v"), col("codes"),
        model.codebooks).as("s")).as[Double].collect()
    assert(corrupt.length == 1 && !corrupt.head.isNaN)
    intercept[IllegalArgumentException] {
      Pq.fit(df, col("v"), m = 3, k = 2) // 4 dims not divisible by 3
    }
  }
}
