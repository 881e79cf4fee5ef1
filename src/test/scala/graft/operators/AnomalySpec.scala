package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  /** One group, buckets 1..9 with count 10 each, bucket 10 with 100 —
    * a 9-normal-1-spike series expanded to raw rows.
    */
  private def spiky = {
    val rows = (1 to 9).flatMap(b => Seq.fill(10)(("a", b))) ++
      Seq.fill(100)(("a", 10))
    rows.toDF("g", "b")
  }

  test("flags the spike and only the spike") {
    val out = Anomaly.robustCountAnomalies(spiky, col("g"), col("b"))
      .collect().map(r => r.getInt(1) -> r.getBoolean(5)).toMap
    assert(out(10), "the 100-count bucket must flag")
    assert((1 to 9).forall(b => !out(b)), "steady buckets must not flag")
  }

  test("median/MAD resist a mean-dragging outlier") {
    val r = Anomaly.robustCountAnomalies(spiky, col("g"), col("b"))
      .select("med", "mad").distinct().collect()
    assert(r.length == 1)
    // mean would be 19; the median stays 10 and MAD stays 0
    assert(r(0).getDouble(0) == 10.0 && r(0).getDouble(1) == 0.0)
  }

  test("constant series flags nothing even with mad = 0") {
    val flat = (1 to 6).flatMap(b => Seq.fill(5)(("a", b))).toDF("g", "b")
    val out = Anomaly.robustCountAnomalies(flat, col("g"), col("b"))
    assert(out.where(col("is_anomaly")).count() == 0L)
  }

  test("groups are scored independently") {
    // group b runs 10x hotter; its steady buckets must not flag just
    // because group a is cold
    val rows = (1 to 8).flatMap(b => Seq.fill(5)(("a", b))) ++
      (1 to 8).flatMap(b => Seq.fill(50)(("b", b))) ++
      Seq.fill(500)(("b", 9))
    val out = Anomaly.robustCountAnomalies(rows.toDF("g", "b"),
      col("g"), col("b"))
    val flagged = out.where(col("is_anomaly"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(flagged == Set(("b", 9)))
  }

  test("cusum catches a sustained shift the z-score misses") {
    // steady buckets 1..30 cycle 9/10/11 (30 of 39 values keep the
    // median pinned at 10, mad at 1); buckets 31..39 step to 13 — an
    // adev of exactly 3, NOT > 3·mad, so the z-score is blind to it,
    // but each drifted bucket adds 13−10−0.5 = 2.5 to the cusum,
    // which (on top of the steady cycle's 0.5 carry at bucket 30)
    // clears h·mad = 5 at the second drifted bucket
    val steady = (1 to 30).flatMap(b => Seq.fill(9 + ((b - 1) % 3))(("a", b)))
    val shifted = (31 to 39).flatMap(b => Seq.fill(13)(("a", b)))
    val out = Anomaly.cusumDrift((steady ++ shifted).toDF("g", "b"),
      col("g"), col("b"), slack = 0.5, h = 5.0)
      .collect().map(r => r.getInt(1) -> r.getBoolean(5)).toMap
    assert((32 to 39).forall(out(_)), s"drift region must flag: $out")
    assert((1 to 31).forall(b => !out(b)),
      "steady region and sub-threshold ramp must not flag")
    // cross-check: the z-score detector sees NO anomaly anywhere here
    // (adev ≤ 3 everywhere, threshold is strict)
    val z = Anomaly.robustCountAnomalies((steady ++ shifted).toDF("g", "b"),
      col("g"), col("b"))
    assert(z.where(col("is_anomaly")).count() == 0L,
      "fixture must be invisible to the point detector")
  }

  test("cusum closed form matches the sequential recursion") {
    // random-ish fixed series; recompute s_t = max(0, s_{t-1}+d) on
    // the driver from the same med/mad and compare
    val counts = Seq(5, 7, 3, 9, 9, 2, 8, 11, 4, 6)
    val rows = counts.zipWithIndex.flatMap { case (c, b) =>
      Seq.fill(c)(("a", b)) }
    val out = Anomaly.cusumDrift(rows.toDF("g", "b"), col("g"), col("b"),
        slack = 0.5, h = 5.0)
      .orderBy("bucket").collect()
    val med = {
      val s = counts.sorted.map(_.toDouble)
      (s(4) + s(5)) / 2
    }
    val mad = {
      val s = counts.map(c => math.abs(c - med)).sorted
      (s(4) + s(5)) / 2
    }
    var sp = 0.0
    var sn = 0.0
    out.foreach { r =>
      val c = r.getLong(2).toDouble
      sp = math.max(0.0, sp + (c - med - 0.5 * mad))
      sn = math.max(0.0, sn + (med - c - 0.5 * mad))
      assert(r.getDouble(3) == sp && r.getDouble(4) == sn,
        s"bucket ${r.get(1)}: got (${r.getDouble(3)},${r.getDouble(4)}) want ($sp,$sn)")
    }
  }

  test("cusum closed form matches the recursion on adversarial series") {
    // series crafted to exercise the running-min reflection: deep
    // negative excursions, exact-zero touches, long climbs
    val seriesSet = Seq(
      Seq(1, 1, 1, 20, 1, 1, 1),          // single spike then decay
      Seq(10, 1, 10, 1, 10, 1),           // alternating deep swings
      Seq(3, 3, 3, 3, 3, 3),              // constant (mad = 0)
      Seq(1, 2, 3, 4, 5, 6, 7, 8))        // monotone climb
    seriesSet.foreach { counts =>
      val rows = counts.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(c)(("g", b)) }
      val out = Anomaly.cusumDrift(rows.toDF("g", "b"), col("g"),
          col("b"), slack = 0.5, h = 5.0)
        .orderBy("bucket").collect()
      val sorted = counts.sorted.map(_.toDouble)
      def medOf(xs: Seq[Double]) = {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }
      val med = medOf(sorted)
      val mad = medOf(counts.map(c => math.abs(c - med)))
      var sp = 0.0; var sn = 0.0
      out.foreach { r =>
        val c = r.getLong(2).toDouble
        sp = math.max(0.0, sp + (c - med - 0.5 * mad))
        sn = math.max(0.0, sn + (med - c - 0.5 * mad))
        assert(r.getDouble(3) == sp && r.getDouble(4) == sn,
          s"series $counts bucket ${r.get(1)}")
      }
    }
  }

  test("the per-group stats joins broadcast onto the series") {
    val plan = Anomaly.robustCountAnomalies(spiky, col("g"), col("b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast stats joins in:\n$plan")
  }

  test("denseCountSeries fills calendar gaps and passes a NULL group " +
    "through sparse — never a fabricated zero NEXT TO a real count") {
    val rows = Seq(("a", 1), ("a", 3), (null, 1), (null, 1))
      .toDF("g", "b")
    val calendar = Seq(1, 2, 3).toDF("bucket")
    val out = Anomaly.denseCountSeries(rows, col("g"), col("b"), calendar)
      .collect().map(r =>
        (Option(r.getString(0)), r.getInt(1)) -> r.getLong(2)).toMap
    // group a densified over the full calendar
    assert(out(Some("a") -> 1) == 1L && out(Some("a") -> 2) == 0L &&
      out(Some("a") -> 3) == 1L)
    // null group: exactly the sparse series' one row, cnt = 2 — the
    // non-null-safe USING join must not have emitted BOTH a cnt=0 row
    // and the real row for (null, 1), nor calendar rows for buckets
    // the null group never had
    assert(out(None -> 1) == 2L)
    assert(out.size == 4, out.toString)
  }
}
