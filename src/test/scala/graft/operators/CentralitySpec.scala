package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CentralitySpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  /** Single-threaded reference of the exact fixed-point recurrence —
    * same integer arithmetic, no Spark. The distributed result must
    * match it BIT-FOR-BIT (that is the operator's whole contract).
    */
  private def ref(nodes: Seq[Long], pairs: Seq[(Long, Long)], iters: Int,
                  scale: Long): Map[Long, Long] = {
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val s0 = scale / nodes.size
    val base = 15L * s0 / 100L
    var s = nodes.map(_ -> s0).toMap
    for (_ <- 1 to iters) {
      val inflow = adj.groupBy(_._2).view
        .mapValues(_.map { case (src, _) => s(src) / deg(src) }.sum).toMap
      s = nodes.map(id =>
        id -> (base + 85L * inflow.getOrElse(id, 0L) / 100L)).toMap
    }
    s
  }

  private val nodes = Seq(1L, 2L, 3L, 4L)
  private val path = Seq((1L, 2L), (2L, 3L)) // path graph + isolated 4

  private def run(iters: Int, truncateEvery: Int = 8): Map[Long, Long] =
    Centrality.fixedPointPageRank(
      nodes.toDF("doc_id"), col("doc_id"),
      path.toDF("id_a", "id_b"), iterations = iters,
      truncateEvery = truncateEvery)
      .as[(Long, Long)].collect().toMap

  test("matches the single-threaded exact recurrence bit-for-bit") {
    assert(run(3) == ref(nodes, path, 3, 1000000000000L))
  }

  test("center of the path ranks highest; isolated node sits at base") {
    val got = run(3)
    assert(got(2L) > got(1L) && got(1L) == got(3L), got.toString)
    val base = 15L * (1000000000000L / 4) / 100L
    assert(got(4L) == base, s"isolated node drifted: ${got(4L)} vs $base")
    assert(got.values.forall(_ > 0L))
  }

  test("localCheckpoint truncation does not change the numbers") {
    assert(run(5, truncateEvery = 2) == ref(nodes, path, 5, 1000000000000L))
  }

  test("deterministic across invocations") {
    assert(run(3) == run(3))
  }

  test("returned plan is the checkpoint scan, free of iteration joins") {
    // the dedup_clusters plan-bound pattern: the eager localCheckpoint
    // must truncate lineage, so caller actions scan an ExistingRDD
    // instead of replaying every iteration's join against the cached
    // edge list
    val scores = Centrality.fixedPointPageRank(
      nodes.toDF("doc_id"), col("doc_id"),
      path.toDF("id_a", "id_b"), iterations = 5)
    val plan = scores.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("releases its caches before returning") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Centrality.fixedPointPageRank(
      nodes.toDF("doc_id"), col("doc_id"),
      path.toDF("id_a", "id_b"), iterations = 3)
    // unpersist(blocking = false) is async; poll briefly. The one
    // surviving entry is the eager localCheckpoint itself (that IS the
    // returned result); the edge and degree caches must be gone.
    val deadline = System.nanoTime() + 10000000000L
    def leaked() = (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    while (leaked() > 1 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(leaked() <= 1, s"leaked ${leaked()} cached RDDs (expected <= 1)")
  }

  test("rejects degenerate parameters") {
    intercept[IllegalArgumentException] { run(0) }
    intercept[IllegalArgumentException] {
      Centrality.fixedPointPageRank(nodes.toDF("doc_id"), col("doc_id"),
        path.toDF("id_a", "id_b"), iterations = 1, scale = 10L)
    }
  }
}
