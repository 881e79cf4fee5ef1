package graft

import org.apache.spark.sql.functions._

import graft.plans.ZoneMapPruning

/** The zone-map skipping optimizer rule: result identity with the
  * unpruned scan (soundness), actual directory pruning in the physical
  * plan (effectiveness), and the bail-out paths (safety).
  */
class ZoneMapPruningSpec extends SparkTestBase {

  import TestSpark.spark.implicits._

  // 1000 points on a diagonal band so buckets have tight boxes, plus
  // null-x rows (must never be lost by pruning) — bucketed into 16
  // partition directories by the x prefix
  private lazy val table: String = {
    val dir = tempDir("zmprune").resolve("t").toString
    val rows = (0 until 1000).map { i =>
      (java.lang.Long.valueOf((i * 61L) % 4096),
        java.lang.Long.valueOf(((i * 61L) % 4096 + i % 7)),
        i.toLong)
    } ++ Seq((null.asInstanceOf[java.lang.Long],
      java.lang.Long.valueOf(5L), -1L))
    rows.toDF("x", "y", "payload")
      .withColumn("z_bucket",
        coalesce(shiftright(col("x"), 8), lit(99L))) // nulls -> bucket 99
      .write.partitionBy("z_bucket").parquet(dir)
    dir
  }

  private def query(path: String) =
    spark.read.parquet(path)
      .where(col("x") >= 512L && col("x") <= 1023L && col("y") <= 1100L)
      .select(col("x"), col("y"), col("payload"))

  test("pruned scan returns exactly the unpruned rows; plan skips partitions") {
    val expected = query(table).collect().map(_.toSeq).sortBy(_.toString)
    ZoneMapPruning.attach(spark, table, "z_bucket", "x", "y")
    try {
      val pruned = query(table)
      val got = pruned.collect().map(_.toSeq).sortBy(_.toString)
      assert(got.sameElements(expected) && got.nonEmpty)
      val plan = plans.PlanInspect.planString(pruned)
      assert(plan.replaceAll("\\s+", " ")
        .matches(".*PartitionFilters: \\[[^\\]]*z_bucket[^\\]]*IN.*"), plan)
      // an impossible box prunes EVERYTHING via the false literal
      assert(spark.read.parquet(table)
        .where(col("x") >= 100000L && col("y") >= 100000L).count() == 0)
    } finally ZoneMapPruning.detach(spark, table)
  }

  test("null rows survive: a bucket of null-x rows is never a lost row") {
    ZoneMapPruning.attach(spark, table, "z_bucket", "x", "y")
    try {
      // range predicates can't match null x anyway — identity holds
      assert(query(table).where(col("payload") >= 0).count() ==
        query(table).count())
      // and a filter that does NOT constrain x/y leaves nulls reachable
      assert(spark.read.parquet(table).where(col("payload") === -1L)
        .count() == 1)
    } finally ZoneMapPruning.detach(spark, table)
  }

  test("bail-outs: unregistered table, OR predicates, no extractable bounds") {
    // not registered -> byte-identical plan
    val plain = query(table)
    val planBefore = plans.PlanInspect.planString(plain)
    assert(!planBefore.contains("z_bucket IN"), planBefore)
    ZoneMapPruning.attach(spark, table, "z_bucket", "x", "y")
    try {
      // top-level OR contributes no bounds -> unchanged (and correct)
      val orQ = spark.read.parquet(table)
        .where(col("x") >= 4000L || col("y") <= 3L)
      assert(!plans.PlanInspect.planString(orQ)
        .replaceAll("\\s+", " ").contains("z_bucket IN"),
        plans.PlanInspect.planString(orQ))
      ZoneMapPruning.detach(spark, table)
      // detached -> no rewrite again
      assert(!plans.PlanInspect.planString(query(table))
        .replaceAll("\\s+", " ")
        .matches(".*PartitionFilters: \\[[^\\]]*z_bucket[^\\]]*IN.*"))
    } finally ZoneMapPruning.detach(spark, table)
  }
}
