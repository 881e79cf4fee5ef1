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

  /** Weighted single-threaded reference — same integer recurrence with
    * per-edge weights.
    */
  private def refWeighted(nodes: Seq[Long], pairs: Seq[(Long, Long, Long)],
                          iters: Int, scale: Long): Map[Long, Long] = {
    val adj = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val wsum = adj.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val s0 = scale / nodes.size
    val base = 15L * s0 / 100L
    var s = nodes.map(_ -> s0).toMap
    for (_ <- 1 to iters) {
      val inflow = adj.groupBy(_._2).view.mapValues(
        _.map { case (src, _, w) => s(src) * w / wsum(src) }.sum).toMap
      s = nodes.map(id =>
        id -> (base + 85L * inflow.getOrElse(id, 0L) / 100L)).toMap
    }
    s
  }

  private def runWeighted(ns: Seq[Long], ps: Seq[(Long, Long, Long)],
                          iters: Int): Map[Long, Long] =
    Centrality.fixedPointPageRankWeighted(ns.toDF("doc_id"), col("doc_id"),
        ps.toDF("id_a", "id_b", "w"), col("w"), iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("weighted pagerank matches the weighted reference bit-for-bit") {
    val ns = Seq(1L, 2L, 3L, 4L)
    val ps = Seq((1L, 2L, 9L), (2L, 3L, 1L), (3L, 4L, 500000L))
    assert(runWeighted(ns, ps, 3) == refWeighted(ns, ps, 3, 1000000000000L))
  }

  test("uniform weights reproduce the unweighted scores exactly") {
    val ps = path.map { case (a, b) => (a, b, 7L) }
    assert(runWeighted(nodes, ps, 3) == run(3))
  }

  test("a heavier edge pulls more of its neighbor's outflow") {
    // 2 splits its score between 1 (weight 9) and 3 (weight 1)
    val ns = Seq(1L, 2L, 3L)
    val got = runWeighted(ns, Seq((1L, 2L, 9L), (2L, 3L, 1L)), 1)
    assert(got(1L) > got(3L))
  }

  test("non-positive weights are non-edges") {
    val ns = Seq(1L, 2L, 3L)
    val got = runWeighted(ns, Seq((1L, 2L, 5L), (2L, 3L, 0L)), 2)
    // node 3 is isolated: sits at the base score every iteration
    val iso = refWeighted(ns, Seq((1L, 2L, 5L)), 2, 1000000000000L)
    assert(got == iso)
  }

  /** Brute-force reference: count triangles by testing all id triples. */
  private def refTriangles(nodes: Seq[Long],
                           pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = pairs.map { case (a, b) => (a min b, a max b) }.toSet
    def edge(x: Long, y: Long) = es((x min y, x max y))
    val tris = for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if edge(a, b) && edge(b, c) && edge(a, c)
    } yield (a, b, c)
    nodes.map(n => n ->
      tris.count(t => t._1 == n || t._2 == n || t._3 == n).toLong).toMap
  }

  private def runTriangles(ns: Seq[Long], ps: Seq[(Long, Long)]) =
    Centrality.triangleStats(ns.toDF("doc_id"), col("doc_id"),
        ps.toDF("id_a", "id_b"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("triangles: clique, wedge, isolated node") {
    // 1-2-3 triangle, 3-4 pendant, 5 isolated
    val ns = Seq(1L, 2L, 3L, 4L, 5L)
    val ps = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = runTriangles(ns, ps)
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 1.0 / 3.0))) // 2*1/(3*2)
    assert(got(4L) == ((1L, 0L, 0.0)))
    assert(got(5L) == ((0L, 0L, 0.0)))
  }

  test("triangles: K4 matches brute force, each triangle counted once") {
    val ns = Seq(1L, 2L, 3L, 4L)
    val ps = for (a <- ns; b <- ns if a < b) yield (a, b)
    val got = runTriangles(ns, ps)
    val want = refTriangles(ns, ps)
    assert(got.view.mapValues(_._2).toMap == want) // 3 triangles each
    assert(got.values.forall(_._3 == 1.0)) // complete graph: coeff 1
  }

  test("triangles: duplicate and reversed pairs collapse") {
    val ns = Seq(1L, 2L, 3L)
    val ps = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (1L, 3L))
    val got = runTriangles(ns, ps)
    assert(got.view.mapValues(_._2).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: skew-star with one closing edge — hub wedges stay linear") {
    // hub 0 connected to 1..20, plus edge (1,2): exactly one triangle.
    // Under by-id orientation the hub would fan out C(20,2) wedges;
    // degree-ordering points every spoke INTO the hub instead.
    val ns = (0L to 20L).toSeq
    val ps = (1L to 20L).map(i => (0L, i)) :+ (1L, 2L)
    val got = runTriangles(ns, ps)
    assert(got(0L)._2 == 1L && got(1L)._2 == 1L && got(2L)._2 == 1L)
    assert((3L to 20L).forall(got(_)._2 == 0L))
    assert(got(0L)._1 == 20L)
  }

  private def runKcore(ns: Seq[Long], ps: Seq[(Long, Long)], k: Int,
                       peels: Int): Map[Long, Boolean] =
    Centrality.kCoreBounded(ns.toDF("doc_id"), col("doc_id"),
        ps.toDF("id_a", "id_b"), k = k, maxPeels = peels)
      .as[(Long, Boolean)].collect().toMap

  test("kcore: triangle survives 2-core, pendant and isolated peel off") {
    val ns = Seq(1L, 2L, 3L, 4L, 5L)
    val ps = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = runKcore(ns, ps, k = 2, peels = 2)
    assert(got == Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false))
    val fx = Centrality.kCoreFixpoint(ns.toDF("doc_id"), col("doc_id"),
        ps.toDF("id_a", "id_b"), k = 2)
      .as[(Long, Boolean)].collect().toMap
    assert(fx == got)
  }

  test("kcore: cascading peel empties a path; too few peels fails the gate") {
    val ns = (1L to 6L).toSeq
    val ps = (1L to 5L).map(i => (i, i + 1))
    // 2-core of a path is empty, reached after 3 cascading peels
    val got = runKcore(ns, ps, k = 2, peels = 3)
    assert(got.values.forall(_ == false))
    // one peel only strips the endpoints — the convergence gate must
    // fail the job rather than report the half-peeled set
    val e = intercept[Exception] {
      runKcore(ns, ps, k = 2, peels = 1)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("not converged")))
    val fx = Centrality.kCoreFixpoint(ns.toDF("doc_id"), col("doc_id"),
        ps.toDF("id_a", "id_b"), k = 2, truncateEvery = 2)
      .as[(Long, Boolean)].collect().toMap
    assert(fx.values.forall(_ == false))
  }

  test("kcore: K4 is a 3-core") {
    val ns = Seq(1L, 2L, 3L, 4L)
    val ps = for (a <- ns; b <- ns if a < b) yield (a, b)
    val got = runKcore(ns, ps, k = 3, peels = 1)
    assert(got.values.forall(_ == true))
  }

  test("rejects degenerate parameters") {
    intercept[IllegalArgumentException] { run(0) }
    intercept[IllegalArgumentException] {
      Centrality.fixedPointPageRank(nodes.toDF("doc_id"), col("doc_id"),
        path.toDF("id_a", "id_b"), iterations = 1, scale = 10L)
    }
    intercept[IllegalArgumentException] {
      Centrality.labelPropagation(nodes.toDF("doc_id"), col("doc_id"),
        path.toDF("id_a", "id_b"), iterations = 0)
    }
  }

  private def runLpa(ns: Seq[Long], ps: Seq[(Long, Long)],
                     iters: Int): Map[Long, Long] =
    Centrality.labelPropagation(ns.toDF("doc_id"), col("doc_id"),
        ps.toDF("id_a", "id_b"), iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("lpa: bridged triangles split into two communities; CC would merge them") {
    // two triangles joined by ONE bridge edge — a single connected
    // component, but frequency voting keeps the dense cores apart.
    // Expected labels hand-simulated round by round (ties -> min label):
    //   L1 = [2,1,1,3,4,4], L2 = [1,1,1,4,3,3], L3 = [1,1,1,3,3,3]
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L) // 7 isolated
    val ps = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    assert(runLpa(ns, ps, 3) == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L,
      7L -> 7L))
    // the intermediate rounds match the hand simulation too (pins the
    // synchronous-update semantics, not just a lucky fixpoint)
    assert(runLpa(ns, ps, 1) == Map(
      1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 4L, 6L -> 4L,
      7L -> 7L))
    assert(runLpa(ns, ps, 2) == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L,
      7L -> 7L))
  }

  test("lpa: a clique labels to its min id; determinism across repartition") {
    val ns = Seq(10L, 11L, 12L, 13L)
    val ps = Seq((10L, 11L), (10L, 12L), (10L, 13L),
      (11L, 12L), (11L, 13L), (12L, 13L))
    val a = runLpa(ns, ps, 2)
    val b = Centrality.labelPropagation(
        ns.toDF("doc_id").repartition(7), col("doc_id"),
        ps.toDF("id_a", "id_b").repartition(5), iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.toSet == Set(10L))
  }

  test("lpa: returned plan is the checkpoint scan, free of iteration joins") {
    val got = Centrality.labelPropagation(nodes.toDF("doc_id"),
      col("doc_id"), path.toDF("id_a", "id_b"), iterations = 3)
    val plan = got.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }
}
