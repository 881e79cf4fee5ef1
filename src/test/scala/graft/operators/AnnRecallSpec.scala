package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** Recall of the approximate paths against the exact baseline on real
  * harness embeddings — the quality side of the compute/recall trade-off
  * the ANN operators document.
  */
class AnnRecallSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("SRP and IVF recall vs the exact top-10") {
    val embs = Tables.load(spark, dir, "embeddings")
    val queries = embs.filter(col("vec_id") % 50 === 0)

    val exact = topkSet(Similarity.bruteForceTopK(embs, col("vec_id"),
      col("embedding"), queries, col("vec_id"), col("embedding"), k = 10))

    // random high-dim embeddings are the adversarial LSH case (neighbors
    // near-orthogonal): use coarse buckets (fewer bits) for recall
    val srp = topkSet(Similarity.srpBucketTopK(embs, col("vec_id"),
      col("embedding"), queries, col("vec_id"), col("embedding"), k = 10,
      dim = 64, bits = 4, probes = 4))

    val model = Ivf.fit(embs, col("embedding"), nlist = 8)
    val assigned = Ivf.assign(model, embs, col("vec_id"), col("embedding"))
    val ivf = topkSet(Ivf.topK(model, assigned, queries, col("vec_id"),
      col("embedding"), k = 10, nprobe = 4))

    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      per.sum / per.size
    }

    val srpRecall = recall(srp)
    val ivfRecall = recall(ivf)
    // loose floors: random 64-dim embeddings are a hard ANN case; the
    // point is the knobs work and quality is monitored, not a SOTA bound
    assert(srpRecall >= 0.3, s"SRP recall $srpRecall")
    assert(ivfRecall >= 0.3, s"IVF recall $ivfRecall")

    // more probes must not reduce SRP recall
    val srpNarrow = topkSet(Similarity.srpBucketTopK(embs, col("vec_id"),
      col("embedding"), queries, col("vec_id"), col("embedding"), k = 10,
      dim = 64, bits = 4, probes = 0))
    assert(recall(srpNarrow) <= srpRecall + 1e-9)
  }

  test("operatingPoint: sqrt-scaled power-of-two nlist, constant probe " +
    "fraction, floors and the extreme-scale cap hold") {
    import graft.operators.Ivf
    // small corpora sit on the floors
    assert(Ivf.operatingPoint(100L) == Ivf.OperatingPoint(16, 4, 4))
    // sf0.1-ish and 10x-ish corpora: nlist tracks sqrt(n) as a power of
    // two; nprobe stays nlist/4 (constant coverage), factor nlist/8
    assert(Ivf.operatingPoint(6400L) == Ivf.OperatingPoint(64, 16, 8))
    assert(Ivf.operatingPoint(64000L) == Ivf.OperatingPoint(256, 64, 32))
    // monotone in n, never a regression to the floor at huge n (the
    // Int-shift wrap this test exists to pin): max Long stays capped at
    // 2^20 lists instead of collapsing to 16
    val big = Ivf.operatingPoint(Long.MaxValue)
    assert(big.nlist == (1 << 20) && big.nprobe == (1 << 18), big.toString)
    val pts = Seq(1L, 1000L, 100000L, 10000000L, Long.MaxValue)
      .map(Ivf.operatingPoint)
    assert(pts.sliding(2).forall { case Seq(a, b) => a.nlist <= b.nlist },
      pts.toString)
    intercept[IllegalArgumentException](Ivf.operatingPoint(0L))
  }

  test("recallGate: empty truth set passes vacuously (n_queries = 0), " +
    "below-floor truth still raises") {
    val s = spark
    import s.implicits._
    import graft.queries.QueryHelpers
    // a testdata refresh can leave a windowed truth set EMPTY at the
    // smallest SF (embed_near_dup_srp_scaled at sf0.001, r17): avg()
    // over zero rows is NULL and assert_true(NULL) raised with a NULL
    // message — the gate must instead pass with an auditable
    // n_queries = 0 summary row
    val empty = Seq.empty[(Long, Long)].toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 2L)).toDF("query_id", "neighbor_id")
    val row = QueryHelpers.recallGate(empty, approx, floor = 0.9,
      what = "empty-truth").collect()
    assert(row.length == 1 && row(0).getLong(0) == 0L, row.mkString)
    // the floor still binds where truth exists
    val truth = Seq((1L, 2L)).toDF("query_id", "neighbor_id")
    val miss = Seq((1L, 3L)).toDF("query_id", "neighbor_id")
    val e = intercept[Exception](
      QueryHelpers.recallGate(truth, miss, 0.9, "below-floor").collect())
    assert(e.getMessage != null, "gate must raise a non-null message")
  }

  test("recallGate: a DUPLICATED approx pair cannot inflate the " +
    "denominator or the hit count (r18 enforcement)") {
    val s = spark
    import s.implicits._
    import graft.queries.QueryHelpers
    // truth: query 1 has two exact neighbors; approx found ONE of them,
    // but emitted it twice (the bug class the in-gate dropDuplicates
    // guards against). Correct recall is 1/2. The pre-enforcement left
    // join would fan the matched truth row out to n_exact=3, n_hit=2 ->
    // 0.667, silently loosening an asserted floor.
    val truth = Seq((1L, 2L), (1L, 3L)).toDF("query_id", "neighbor_id")
    val dupApprox = Seq((1L, 2L), (1L, 2L)).toDF("query_id", "neighbor_id")
    val row = QueryHelpers.recallGate(truth, dupApprox, floor = 0.5,
      what = "dup-approx").collect()
    assert(row.length == 1 && math.abs(row(0).getDouble(1) - 0.5) < 1e-12,
      row.mkString)
    // and the floor binds on the TRUE recall, not the inflated one
    intercept[Exception](QueryHelpers.recallGate(truth, dupApprox,
      floor = 0.6, what = "dup-approx-floor").collect())
  }

  test("Ivf.fit / Pq.fit are placement-independent: the same corpus " +
    "under different partitionings yields the SAME model (r18)") {
    val embs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val shuffled = embs.repartition(13, col("vec_id") + 7)
    val single = embs.coalesce(1)
    def cents(df: org.apache.spark.sql.DataFrame): Seq[Seq[Double]] =
      Ivf.fit(df, col("embedding"), nlist = 8, sampleFraction = 0.5)
        .matrix.map(_.toSeq).toSeq
    assert(cents(shuffled) == cents(single),
      "Ivf.fit model differs across partitionings")
    def books(df: org.apache.spark.sql.DataFrame): Seq[Seq[Seq[Double]]] =
      Pq.fit(df, col("embedding"), m = 8, k = 8)
        .codebooks.map(_.map(_.toSeq).toSeq).toSeq
    assert(books(shuffled) == books(single),
      "Pq.fit codebooks differ across partitionings")
  }
}
