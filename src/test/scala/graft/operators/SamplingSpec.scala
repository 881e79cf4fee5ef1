package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {

  private def docs = {
    import graft.TestSpark.spark.implicits._
    (0L until 2000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
  }

  test("hashSplit: complete, disjoint, deterministic, ~right-sized") {
    val s1 = Sampling.hashSplit(docs, col("id"), 0.9)
    val s2 = Sampling.hashSplit(docs.repartition(7), col("id"), 0.9)
    val m1 = s1.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val m2 = s2.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m1 == m2) // membership is a pure function of id, not partitioning
    assert(m1.size == 2000 && m1.values.forall(v => v == "train" || v == "holdout"))
    val train = m1.values.count(_ == "train")
    assert(train > 1700 && train < 1890, s"train=$train") // ~90% ± noise
  }

  test("hashSplit boundaries: frac 0 keeps nothing, frac 1 keeps everything") {
    assert(Sampling.hashSplit(docs, col("id"), 0.0)
      .filter(col("split") === "train").count() == 0)
    assert(Sampling.hashSplit(docs, col("id"), 1.0)
      .filter(col("split") === "train").count() == 2000)
  }

  test("independent salts draw independent splits") {
    val a = Sampling.hashSplit(docs, col("id"), 0.5, salt = "a")
      .filter(col("split") === "train").select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSplit(docs, col("id"), 0.5, salt = "b")
      .filter(col("split") === "train").select("id").collect().map(_.getLong(0)).toSet
    val overlap = (a & b).size.toDouble / 1000.0
    assert(overlap > 0.35 && overlap < 0.65, s"overlap=$overlap") // ~independent
  }

  test("stratifiedSample: per-stratum fractions, absent strata dropped, stable subset") {
    val s = Sampling.stratifiedSample(docs, col("id"), col("lang"),
      Map("en" -> 0.5, "fr" -> 1.0))
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("de") && !byLang.contains("fr"))
    val en = byLang("en")
    assert(en > 250 && en < 420, s"en=$en") // ~50% of 667
    // the 0.5 sample is a strict subset of the 0.8 sample (stable nesting —
    // an RNG-stream sampler has no such property)
    val wide = Sampling.stratifiedSample(docs, col("id"), col("lang"),
      Map("en" -> 0.8)).select("id").collect().map(_.getLong(0)).toSet
    val narrow = s.select("id").collect().map(_.getLong(0)).toSet
    assert(narrow.subsetOf(wide))
  }
}
