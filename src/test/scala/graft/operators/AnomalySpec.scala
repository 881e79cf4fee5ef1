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

  test("the per-group stats joins broadcast onto the series") {
    val plan = Anomaly.robustCountAnomalies(spiky, col("g"), col("b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast stats joins in:\n$plan")
  }
}
