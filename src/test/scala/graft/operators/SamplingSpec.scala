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

  test("splitLeakage: flags exactly the content keys straddling the split") {
    import graft.TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    // 60 docs, 20 distinct texts x3 copies: with a 50/50 split most
    // triples straddle; expectation derived from hashSplit itself
    val d = (0L until 60L).map(i => (i, s"text-${i % 20}")).toDF("doc_id", "text")
    val sp = Sampling.hashSplit(d, col("doc_id"), 0.5)
      .select("doc_id", "text", "split").as[(Long, String, String)].collect()
    val byText = sp.groupBy(_._2)
    val expect = byText.collect {
      case (text, rows) if rows.exists(_._3 == "train") &&
          rows.exists(_._3 == "holdout") =>
        text -> (rows.filter(_._3 == "train").map(_._1).min,
          rows.filter(_._3 == "holdout").map(_._1).min)
    }
    val got = Sampling.splitLeakage(d, col("doc_id"), col("text"), 0.5)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == expect.size && expect.nonEmpty)
    got.foreach { case (key, nTrain, nHoldout, trainId, holdoutId) =>
      val (eTrain, eHoldout) = expect(key)
      assert(nTrain >= 1 && nHoldout >= 1 && nTrain + nHoldout == 3)
      assert(trainId == eTrain && holdoutId == eHoldout, key)
    }
    // a corpus of unique texts leaks nothing
    val uniq = (0L until 50L).map(i => (i, s"u-$i")).toDF("doc_id", "text")
    assert(Sampling.splitLeakage(uniq, col("doc_id"), col("text"), 0.5)
      .count() == 0L)
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

  test("temperatureWeights: alpha=0.5 weights are exact and sum to 1") {
    import graft.TestSpark.spark.implicits._
    // masses 100/400/1600 -> sqrt 10/20/40 -> weights 1/7, 2/7, 4/7
    val rows = Seq.fill(10)(("a", 10)) ++ Seq.fill(10)(("b", 40)) ++
      Seq.fill(10)(("c", 160))
    val df = rows.toDF("src", "n")
    val got = Sampling.temperatureWeights(df, col("src"), col("n"))
      .select("src", "n_units", "weight")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(
      ("a", 100L, 1e7 / 7e7), ("b", 400L, 2e7 / 7e7), ("c", 1600L, 4e7 / 7e7)))
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-12)
  }

  test("temperatureWeights: q_units is the exact micro-unit long") {
    import graft.TestSpark.spark.implicits._
    val rows = Seq.fill(10)(("a", 10)) ++ Seq.fill(10)(("b", 40)) ++
      Seq.fill(10)(("c", 160))
    val df = rows.toDF("src", "n")
    val got = Sampling.temperatureWeights(df, col("src"), col("n"))
      .select("src", "q_units").as[(String, Long)].collect().toSet
    // sqrt(100)=10, sqrt(400)=20, sqrt(1600)=40 -> micro-units x 1e6
    assert(got == Set(("a", 10000000L), ("b", 20000000L), ("c", 40000000L)))
    val schema = Sampling.temperatureWeights(df, col("src"), col("n")).schema
    assert(schema("q_units").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("allocateBudget: closed-form water level matches iterative water-filling") {
    import graft.TestSpark.spark.implicits._
    val rnd = new scala.util.Random(23)
    // reference: iterate the capped set to fixpoint with the SAME
    // arithmetic (exact long sums, one IEEE division) — the closed-form
    // sorted scan must agree bit-for-bit
    def brute(masses: Seq[(String, Long)], t: Long, maxEpochs: Double): Map[String, Long] = {
      val q = masses.map { case (k, n) =>
        k -> math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong }.toMap
      val cap = masses.map { case (k, n) =>
        k -> math.floor(n.toDouble * maxEpochs).toLong }.toMap
      var capped = Set.empty[String]
      var lam = Double.PositiveInfinity
      var changed = true
      while (changed) {
        val qSum = q.filterNot(kv => capped(kv._1)).values.sum
        if (qSum == 0L) { changed = false; lam = Double.PositiveInfinity }
        else {
          lam = (t - capped.toSeq.map(cap).sum).toDouble / qSum.toDouble
          val newly = q.keys.filterNot(capped)
            .filter(k => lam * q(k).toDouble >= cap(k).toDouble).toSet
          changed = newly.nonEmpty
          capped ++= newly
        }
      }
      masses.map { case (k, _) =>
        k -> (if (lam.isInfinity) cap(k)
              else math.min(cap(k), math.floor(lam * q(k).toDouble).toLong))
      }.toMap
    }
    for (trial <- 1 to 5) {
      // include a zero-mass source: q_units = 0 must not poison the
      // water level (NULL __r sorting first broke the lag chain before
      // the r8 review fix) — it gets 0 tokens, everyone else allocates
      val masses = (1 to 6).map(i => (s"s$i", (rnd.nextInt(1990) + 10).toLong)) :+
        ("s_zero", 0L)
      val total = masses.map(_._2).sum
      // three regimes: loose budget, tight (forces caps), infeasible
      for (t <- Seq(total / 3, (total * 3) / 2, total * 10).map(_ max 1L)) {
        val rows = masses.flatMap { case (k, n) => Seq((k, n)) }
        val got = Sampling.allocateBudget(rows.toDF("src", "n"),
            col("src"), col("n"), totalTokens = t, maxEpochs = 2.0)
          .select("src", "cap_tokens", "alloc_tokens")
          .as[(String, Long, Long)].collect()
        val expect = brute(masses, t, 2.0)
        got.foreach { case (k, cap, alloc) =>
          assert(alloc == expect(k), s"trial $trial t=$t src $k: $alloc vs ${expect(k)}")
          assert(alloc <= cap)
        }
        assert(got.map(_._3).sum <= t || got.map(_._3).sum == got.map(_._2).sum,
          s"budget exceeded: ${got.toSeq}")
      }
    }
  }

  test("allocateBudget: maxGroups guard fails loudly on per-document grouping") {
    import graft.TestSpark.spark.implicits._
    // grouping by a high-cardinality column must raise, not silently
    // funnel the corpus through the single-partition water-level window
    val docs = (1L to 50L).map(i => (s"doc$i", 10L)).toDF("doc_id", "n")
    val e = intercept[Exception] {
      Sampling.allocateBudget(docs, col("doc_id"), col("n"),
        totalTokens = 100L, maxEpochs = 2.0, maxGroups = 10).collect()
    }
    assert(e.getMessage.contains("maxGroups"), e.getMessage)
    // at-or-under the bound still allocates
    val ok = Sampling.allocateBudget(docs, col("doc_id"), col("n"),
      totalTokens = 100L, maxEpochs = 2.0, maxGroups = 50).collect()
    assert(ok.length == 50)
  }

  test("temperatureWeights: alpha<1 upweights small sources vs proportional") {
    import graft.TestSpark.spark.implicits._
    val df = Seq(("small", 100), ("big", 10000)).toDF("src", "n")
    val w = Sampling.temperatureWeights(df, col("src"), col("n"))
      .select("src", "weight").as[(String, Double)].collect().toMap
    // proportional share of `small` is 100/10100 ~ 0.0099; tempered
    // share is 10/110 ~ 0.0909
    assert(w("small") > 0.09 && w("small") < 0.1)
    assert(math.abs(w.values.sum - 1.0) < 1e-12)
  }

  test("temperatureWeights: single corpus scan (no agg-then-join rescan)") {
    import graft.TestSpark.spark.implicits._
    val df = Seq(("a", 1), ("b", 2)).toDF("src", "n")
    val plan = Sampling.temperatureWeights(df, col("src"), col("n"))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).length == 1, plan)
  }

  test("fixedSizeSample: exactly n per stratum, stable, partition-independent") {
    import graft.TestSpark.spark.implicits._
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.fixedSizeSample(d, col("id"), col("lang"), n = 7)
        .select("id").as[Long].collect().toSet
    val s1 = ids(df)
    assert(s1.size == 14) // 7 en + 7 de
    assert(ids(df.repartition(13)) == s1) // partitioning-independent
    // a stratum smaller than n yields the whole stratum, no padding
    val tiny = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("id", "lang")
    val t = Sampling.fixedSizeSample(tiny, col("id"), col("lang"), n = 7)
      .select("id").as[Long].collect().toSet
    assert(t == Set(1L, 2L, 3L))
  }

  test("fixedSizeSample: map-side partial top-n (WindowGroupLimit) in the plan") {
    import graft.TestSpark.spark.implicits._
    val df = (0L until 100L).map(i => (i, "en")).toDF("id", "lang")
    val plan = Sampling.fixedSizeSample(df, col("id"), col("lang"), n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("quantileBuckets: quartile labels with interpolated cut points") {
    import graft.TestSpark.spark.implicits._
    // values 1..8: quantile_cont cuts at 0.25/0.5/0.75 = 2.75/4.5/6.25
    val df = (1 to 8).map(i => (i.toLong, i)).toDF("id", "v")
    val got = Sampling.quantileBuckets(df, col("v"))
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
  }

  test("quantileBuckets: custom fracs, boundary value lands in the lower bucket") {
    import graft.TestSpark.spark.implicits._
    // median of 1..5 is exactly 3 -> value 3 must satisfy v <= cut (lower)
    val df = (1 to 5).map(i => (i.toLong, i)).toDF("id", "v")
    val got = Sampling.quantileBuckets(df, col("v"), fracs = Seq(0.5),
        outCol = "half")
      .select("id", "half").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2))
  }

  test("quantileBuckets rejects malformed fracs") {
    import graft.TestSpark.spark.implicits._
    val df = Seq((1L, 1)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Sampling.quantileBuckets(df, col("v"), fracs = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.quantileBuckets(df, col("v"), fracs = Seq(0.75, 0.25))
    }
    intercept[IllegalArgumentException] {
      Sampling.quantileBuckets(df, col("v"), fracs = Seq(0.5, 1.0))
    }
  }

  test("weightedSystematicSample: exactly k per stratum with uniform weights, " +
    "invariant to partitioning") {
    import graft.TestSpark.spark.implicits._
    val d = (0L until 300L).map(i => (i, if (i % 2 == 0) "en" else "de", 10L))
      .toDF("id", "lang", "w")
    val s = Sampling.weightedSystematicSample(d, col("id"), col("lang"), col("w"), k = 7)
    val counts = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 7L, "de" -> 7L))
    val ids = s.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.weightedSystematicSample(d.repartition(5), col("id"),
      col("lang"), col("w"), k = 7).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2) // pure function of identity + weights, not layout
  }

  test("weightedSystematicSample: a certainty unit (w > total/k) is always kept, once") {
    import graft.TestSpark.spark.implicits._
    // 50 light docs + one holding ~95% of the stratum's mass; k=5 cuts
    val d = ((0L until 50L).map(i => (i, "en", 1L)) :+ (99L, "en", 1000L))
      .toDF("id", "lang", "w")
    (1 to 5).foreach { i =>
      val ids = Sampling.weightedSystematicSample(d, col("id"), col("lang"),
        col("w"), k = 5, salt = s"s$i").select("id").collect().map(_.getLong(0))
      assert(ids.count(_ == 99L) == 1, s"salt s$i: ${ids.mkString(",")}")
    }
  }

  test("weightedSystematicSample: selection probability tracks weight across salts") {
    import graft.TestSpark.spark.implicits._
    // one doc carries half the stratum mass; with k=1 it should be the
    // pick in roughly half the independent draws, a light doc almost never
    val d = ((0L until 100L).map(i => (i, "en", 1L)) :+ (999L, "en", 100L))
      .toDF("id", "lang", "w")
    val wins = (1 to 40).count { i =>
      Sampling.weightedSystematicSample(d, col("id"), col("lang"), col("w"),
        k = 1, salt = s"t$i").select("id").collect().map(_.getLong(0)).contains(999L)
    }
    assert(wins >= 8 && wins <= 32, s"heavy doc won $wins/40") // ~20 expected
  }

  test("weightedSystematicSample edges: k >= rows selects everything once; " +
    "zero-weight rows are never selected") {
    import graft.TestSpark.spark.implicits._
    val d = (0L until 20L).map(i => (i, "en", 1L)).toDF("id", "lang", "w")
    val all = Sampling.weightedSystematicSample(d, col("id"), col("lang"),
      col("w"), k = 40).select("id").collect().map(_.getLong(0))
    assert(all.length == 20 && all.toSet.size == 20) // every row, no dupes
    val withZero = ((0L until 20L).map(i => (i, "en", 1L)) :+ (99L, "en", 0L))
      .toDF("id", "lang", "w")
    (1 to 5).foreach { i =>
      val ids = Sampling.weightedSystematicSample(withZero, col("id"),
        col("lang"), col("w"), k = 3, salt = s"z$i")
        .select("id").collect().map(_.getLong(0))
      assert(!ids.contains(99L), s"zero-weight row selected under salt z$i")
    }
  }

  test("temperatureWeights rejects alpha outside (0,1]") {
    import graft.TestSpark.spark.implicits._
    val df = Seq(("a", 1)).toDF("src", "n")
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(df, col("src"), col("n"), alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(df, col("src"), col("n"), alpha = 1.5)
    }
  }

  test("groupSafeSplit never lets a group straddle the split") {
    import graft.TestSpark.spark.implicits._
    // 200 distinct texts, each duplicated under 3 different ids — the
    // id-keyed hashSplit WILL leak some of these; the group-keyed
    // split must leak none
    val dup = (0L until 600L).map(i => (i, s"text-${i % 200}"))
      .toDF("id", "text")
    val sp = Sampling.groupSafeSplit(dup, col("text"), trainFrac = 0.8)
    val straddled = sp.groupBy("text")
      .agg(countDistinct("split").as("k")).where(col("k") > 1).count()
    assert(straddled == 0L)
    // and the doc-keyed baseline DOES leak on the same corpus, so the
    // guarantee is doing real work here
    val naive = Sampling.hashSplit(dup, col("id"), trainFrac = 0.8)
    val naiveLeaks = naive.groupBy("text")
      .agg(countDistinct("split").as("k")).where(col("k") > 1).count()
    assert(naiveLeaks > 0L, "fixture too easy: naive split didn't leak")
  }

  test("fixedPerGroupSample caps every group at exactly k, stably") {
    import graft.TestSpark.spark.implicits._
    // groups of very different sizes: 1000, 30, 3
    val rows = ((0L until 1000L).map(i => (i, "big")) ++
      (1000L until 1030L).map(i => (i, "mid")) ++
      (1030L until 1033L).map(i => (i, "tiny"))).toDF("id", "g")
    val s1 = Sampling.fixedPerGroupSample(rows, col("id"), col("g"), k = 10)
    val sizes = s1.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("big" -> 10L, "mid" -> 10L, "tiny" -> 3L))
    // deterministic: a second draw is identical
    val a = s1.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.fixedPerGroupSample(rows, col("id"), col("g"), k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // sample_rank is 1..k within each group
    val ranks = s1.where(col("g") === "big")
      .select("sample_rank").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq == (1 to 10))
  }

  test("groupSafeSplit agrees with hashSplit when groups are singletons") {
    import graft.TestSpark.spark.implicits._
    val uniq = (0L until 500L).map(i => (i, s"u-$i")).toDF("id", "text")
    val a = Sampling.groupSafeSplit(uniq, col("text"), 0.7)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same hash input => same assignment as hashSplit keyed on text
    val b = Sampling.hashSplit(uniq, col("text"), 0.7)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.6 && frac < 0.8, s"observed train frac $frac")
  }
}
