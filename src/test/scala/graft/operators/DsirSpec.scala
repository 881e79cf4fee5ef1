package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DsirSpec extends SparkTestBase {

  // raw corpus: 30 finance-flavored docs (target-like) + 30 cooking docs
  // (off-target), distinct vocabularies so the hashed models separate
  private def raw = {
    import graft.TestSpark.spark.implicits._
    val fin = (0L until 30L).map(i =>
      (i, s"stock market price earnings report quarter $i"))
    val cook = (30L until 60L).map(i =>
      (i, s"butter flour sugar oven recipe bake $i"))
    (fin ++ cook).toDF("doc_id", "text")
  }

  private def target = {
    import graft.TestSpark.spark.implicits._
    (1000L until 1010L).map(i =>
      (i, "stock price earnings market report")).toDF("doc_id", "text")
  }

  test("hashedFeatures: per-doc counts sum to unigrams + bigrams") {
    import graft.TestSpark.spark.implicits._
    val d = Seq((1L, "a b c a"), (2L, "x")).toDF("doc_id", "text")
    val got = Dsir.hashedFeatures(d, col("doc_id"), col("text"), buckets = 64)
      .groupBy("doc_id").agg(sum("c").as("n")).as[(Long, Long)]
      .collect().toMap
    // doc 1: 4 unigrams + 3 bigrams; doc 2: 1 unigram + 0 bigrams
    assert(got == Map(1L -> 7L, 2L -> 1L))
  }

  test("hashedFeatures: engine and portable hashes bucket identically-shaped mass") {
    val p = Dsir.hashedFeatures(raw, col("doc_id"), col("text"), 256,
      portableHash = true)
    val e = Dsir.hashedFeatures(raw, col("doc_id"), col("text"), 256,
      portableHash = false)
    // bucket ids differ by design; total feature mass must not
    assert(p.agg(sum("c")).head.getLong(0) == e.agg(sum("c")).head.getLong(0))
    val inRange = e.filter(col("bucket") < 0 || col("bucket") >= 256).count()
    assert(inRange == 0)
  }

  test("importanceWeights: target-like docs outweigh off-target docs") {
    val w = Dsir.importanceWeights(raw, col("doc_id"), col("text"),
      target, col("doc_id"), col("text"), buckets = 1024)
      .select("doc_id", "target_ratio", "log_weight")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(w.length == 60)
    val (fin, cook) = w.partition(_._1 < 30L)
    val finMinLw = fin.map(_._3).min
    val cookMaxLw = cook.map(_._3).max
    assert(finMinLw > cookMaxLw,
      s"every finance doc must outweigh every cooking doc " +
        s"(finMin=$finMinLw cookMax=$cookMaxLw)")
    assert(fin.map(_._2).min > cook.map(_._2).max)
  }

  test("importanceWeights: log_weight matches a hand-rolled model") {
    import graft.TestSpark.spark.implicits._
    // tiny corpus, big bucket space -> no collisions; recompute exactly
    val r = Seq((0L, "aa bb"), (1L, "cc dd")).toDF("doc_id", "text")
    val t = Seq((9L, "aa bb")).toDF("doc_id", "text")
    val buckets = 1 << 16
    val got = Dsir.importanceWeights(r, col("doc_id"), col("text"),
      t, col("doc_id"), col("text"), buckets)
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    // features per doc: 2 unigrams + 1 bigram, every gram count 1 in its
    // corpus; Nt = 3, Nr = 6
    def lw(cntT: Seq[Long], cntR: Seq[Long]): Double =
      cntT.zip(cntR).map { case (ct, cr) =>
        math.log(ct + 1.0) - math.log(cr + 1.0)
      }.sum + 3.0 * (math.log(6.0 + buckets) - math.log(3.0 + buckets))
    val exp0 = lw(Seq(1L, 1L, 1L), Seq(1L, 1L, 1L)) // doc 0 == target doc
    val exp1 = lw(Seq(0L, 0L, 0L), Seq(1L, 1L, 1L)) // doc 1 disjoint
    assert(math.abs(got(0L) - exp0) < 1e-9, s"got ${got(0L)} want $exp0")
    assert(math.abs(got(1L) - exp1) < 1e-9, s"got ${got(1L)} want $exp1")
    assert(got(0L) > got(1L))
  }

  test("selectTopK: exact-k, ratio-descending, deterministic ties") {
    val w = Dsir.importanceWeights(raw, col("doc_id"), col("text"),
      target, col("doc_id"), col("text"), buckets = 1024)
    val top = Dsir.selectTopK(w, 20)
      .select("doc_id", "target_ratio").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length == 20)
    assert(top.map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
    // 30 finance docs dominate the ratio ordering; top-20 is all finance
    assert(top.forall(_._1 < 30L), s"non-finance doc in top-20: $top")
  }

  test("gumbelResample: deterministic per seed, exact-k, biased to target") {
    val w = Dsir.importanceWeights(raw, col("doc_id"), col("text"),
      target, col("doc_id"), col("text"), buckets = 1024)
      .persist()
    val a = Dsir.gumbelResample(w, 20, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Dsir.gumbelResample(w, 20, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c = Dsir.gumbelResample(w, 20, seed = 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    w.unpersist()
    assert(a == b, "same seed must select the same set")
    assert(a.size == 20 && c.size == 20)
    // weights separate the classes by orders of magnitude; even with
    // Gumbel noise the selection should be overwhelmingly finance
    val finShare = a.count(_ < 30L).toDouble / 20.0
    assert(finShare >= 0.9, s"finance share $finShare")
  }
}
