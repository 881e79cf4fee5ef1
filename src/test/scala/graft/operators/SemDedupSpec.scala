package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

class SemDedupSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private val dir = "/root/testdata/sf0.001"

  // Planted geometry in 4-d: two duplicate families on distinct axes plus
  // two loners. Within a family cosine = 1 (scaled copies); across
  // families / to loners cosine = 0. Axis-aligned so k-means can't
  // accidentally merge families.
  private def planted = Seq(
    (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(2f, 0f, 0f, 0f)),
    (3L, Array(3f, 0f, 0f, 0f)),
    (10L, Array(0f, 1f, 0f, 0f)), (11L, Array(0f, 5f, 0f, 0f)),
    (20L, Array(0f, 0f, 1f, 0f)),
    (21L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "v")

  test("exact form keeps one min-id survivor per duplicate family") {
    val kept = SemDedup.semanticPrune(planted, col("vec_id"), col("v"),
      minCosine = 0.9, dim = 4, nlist = 1)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 10L, 20L, 21L))
  }

  test("survivor policies: min-id vs the paper's lowest-centroid-sim keep") {
    // One duplicate pair {1, 2} plus an identical far pair {3, 4} that
    // pulls the single centroid off the pair's bisector. Unnormalized
    // centroid direction = v1+v2+v3+v4 = (1.9939, 2.1104, 0, 0), so
    // v1 = normalize(0.9, 0.1) scores HIGHER centroid sim (2.2147 ∝)
    // than v2 = (1, 0) (1.9939 ∝): min-id keeps 1, the paper rule
    // keeps the prototype-farther member 2. The identical pair {3, 4}
    // has equal sims — the tie must break to the lower id under BOTH.
    val docs = Seq(
      (1L, Array(0.9939f, 0.1104f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "v")
    def kept(paper: Boolean): Seq[Long] =
      SemDedup.semanticPrune(docs, col("vec_id"), col("v"),
        minCosine = 0.95, dim = 4, nlist = 1,
        keepLowestCentroidSim = paper)
        .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept(paper = false) == Seq(1L, 3L))
    assert(kept(paper = true) == Seq(2L, 3L))
  }

  test("transitive chains collapse to one survivor, not one per pair") {
    // chain: 1~2 (cos .9947), 2~3 (cos .9947), but cos(1,3) = .9788 is
    // ALSO above threshold here, so tighten: use vectors where the
    // endpoints fall below tau while adjacent links stay above.
    val chain = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 1f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "v")
    // cos(1,2) = cos(2,3) = 0.7071, cos(1,3) = 0 — pairwise graph is a
    // path; the component must still collapse to min id 1
    val kept = SemDedup.semanticPrune(chain, col("vec_id"), col("v"),
      minCosine = 0.7, dim = 2, nlist = 1)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L))
  }

  test("nlist=1 matches embeddingNearDupPairs bits=0 exactly") {
    val embs = Tables.load(spark, dir, "embeddings")
    val a = SemDedup.semanticDupPairs(embs, col("vec_id"), col("embedding"),
      minCosine = 0.4, dim = 64, nlist = 1)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    val b = Dedup.embeddingNearDupPairs(embs, col("vec_id"),
      col("embedding"), minCosine = 0.4, dim = 64, bits = 0, bands = 1)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("clustered pairs are a subset of exact pairs with identical scores") {
    val embs = Tables.load(spark, dir, "embeddings")
    def toMap(nlist: Int): Map[(Long, Long), Double] =
      SemDedup.semanticDupPairs(embs, col("vec_id"), col("embedding"),
        minCosine = 0.4, dim = 64, nlist = nlist)
        .select("id_a", "id_b", "cosine").as[(Long, Long, Double)]
        .collect().map(r => ((r._1, r._2), r._3)).toMap
    val exact = toMap(1)
    val clustered = toMap(4)
    assert(clustered.nonEmpty)
    clustered.foreach { case (k, cos) =>
      assert(exact.contains(k), s"clustered pair $k missing from exact")
      assert(exact(k) == cos, s"score drift on $k")
    }
    // and pruning can only get LESS aggressive as candidates shrink:
    // every exact survivor survives the clustered prune too
    val keptExact = SemDedup.semanticPrune(embs, col("vec_id"),
      col("embedding"), minCosine = 0.4, dim = 64, nlist = 1)
      .select("vec_id").as[Long].collect().toSet
    val keptClustered = SemDedup.semanticPrune(embs, col("vec_id"),
      col("embedding"), minCosine = 0.4, dim = 64, nlist = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(keptExact.subsetOf(keptClustered))
    assert(keptClustered.size >= keptExact.size)
  }

  test("deterministic across invocations; empty pair graph keeps everything") {
    val embs = Tables.load(spark, dir, "embeddings")
    def run() = SemDedup.semanticDupPairs(embs, col("vec_id"),
      col("embedding"), minCosine = 0.4, dim = 64, nlist = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(run() == run())
    // tau above any cosine in uniform-random 64-d: nothing pairs, prune
    // is the identity set
    val kept = SemDedup.semanticPrune(embs, col("vec_id"), col("embedding"),
      minCosine = 0.999, dim = 64, nlist = 4)
      .select("vec_id").as[Long].collect()
    assert(kept.length == embs.count())
    assert(kept.distinct.length == kept.length)
  }

  test("rejects a nonsense threshold") {
    intercept[IllegalArgumentException] {
      SemDedup.semanticDupPairs(planted, col("vec_id"), col("v"),
        minCosine = 0.0, dim = 4, nlist = 1)
    }
  }

  test("nearDupPairsIvf: subset-of-exact with exact scores, full recall " +
    "on co-clustered families, nlist=1 degenerates to all-pairs") {
    val exact = Dedup.embeddingNearDupPairs(planted, col("vec_id"),
      col("v"), minCosine = 0.9, dim = 4, bits = 0, bands = 1)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    // axis-aligned duplicate families co-cluster under any fit, so the
    // IVF candidate arm recovers the full exact pair set — scores must
    // be the EXACT cosine (candidates only prune, never approximate)
    val ivf = SemDedup.nearDupPairsIvf(planted, col("vec_id"), col("v"),
      minCosine = 0.9, nlist = 4, nprobe = 1)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(ivf.subsetOf(exact), s"candidate outside exact set: $ivf")
    assert(ivf == exact, s"missed pairs: ${exact -- ivf}")
    // nlist <= 1 is the verified all-pairs twin
    val deg = SemDedup.nearDupPairsIvf(planted, col("vec_id"), col("v"),
      minCosine = 0.9, nlist = 1, nprobe = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(deg == exact.map(p => (p._1, p._2)))
  }

  test("nearDupPairsIvf multi-probe: one row per pair even when several " +
    "probed lists coincide; ordering and bounds hold") {
    // nprobe = 3 of nlist = 4: family members share up to 3 probed
    // lists — without the distinct-before-rejoin each shared list
    // would emit (and score) the pair once more
    val rows = SemDedup.nearDupPairsIvf(planted, col("vec_id"), col("v"),
      minCosine = 0.9, nlist = 4, nprobe = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(rows.distinct.length == rows.length,
      s"duplicate pair rows: ${rows.groupBy(identity).filter(_._2.length > 1).keys}")
    assert(rows.forall { case (a, b) => a < b })
    // multi-probe only widens candidates: superset of the nprobe=1 set
    val single = SemDedup.nearDupPairsIvf(planted, col("vec_id"), col("v"),
      minCosine = 0.9, nlist = 4, nprobe = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(rows.toSet))
    intercept[IllegalArgumentException] {
      SemDedup.nearDupPairsIvf(planted, col("vec_id"), col("v"),
        minCosine = 0.9, nlist = 4, nprobe = 0)
    }
  }

  // Cross-set contamination: eval prototypes on the two family axes.
  // Exact expectation at tau=0.9: every family member flags against its
  // axis prototype (cos = 1), loners 20/21 stay clean, and train-internal
  // duplicate pairs are NOT emitted (cross-set only).
  private def evalSet = Seq(
    (100L, Array(1f, 0f, 0f, 0f)), (101L, Array(0f, 1f, 0f, 0f)))
    .toDF("vec_id", "v")

  test("crossContamination exact twin: cross-set pairs only, exact scores") {
    val got = SemDedup.crossContamination(
      planted, col("vec_id"), col("v"), evalSet, col("vec_id"), col("v"),
      minCosine = 0.9, nlist = 0)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 100L),
      (10L, 101L), (11L, 101L)))
    val cos = SemDedup.crossContamination(
      planted, col("vec_id"), col("v"), evalSet, col("vec_id"), col("v"),
      minCosine = 0.9, nlist = 0)
      .select("cosine").as[Double].collect()
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-6))
  }

  test("crossContamination bucketed: subset of exact, full recall here") {
    // axis-aligned families -> k-means separates them; nprobe=1 already
    // routes each eval prototype to its family's list
    val exact = SemDedup.crossContamination(
      planted, col("vec_id"), col("v"), evalSet, col("vec_id"), col("v"),
      minCosine = 0.9, nlist = 0)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    val bucketed = SemDedup.crossContamination(
      planted, col("vec_id"), col("v"), evalSet, col("vec_id"), col("v"),
      minCosine = 0.9, nlist = 4, nprobe = 1)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(exact), s"bucketed pair outside exact: $bucketed")
    assert(bucketed == exact, s"missed pairs: ${exact -- bucketed}")
  }

  test("crossContamination rejects bad operating points") {
    intercept[IllegalArgumentException] {
      SemDedup.crossContamination(planted, col("vec_id"), col("v"),
        evalSet, col("vec_id"), col("v"),
        minCosine = 1.5, nlist = 0)
    }
    intercept[IllegalArgumentException] {
      SemDedup.crossContamination(planted, col("vec_id"), col("v"),
        evalSet, col("vec_id"), col("v"),
        minCosine = 0.9, nlist = 4, nprobe = 0)
    }
  }

  test("scaled operating point prunes planted near-identical twins " +
    "(the semantic_prune_scaled contract)") {
    // Mirror of the registered query on the harness embeddings: plant a
    // near-identical twin (vec_id + 1e9, tiny per-index jitter,
    // cos ≈ 0.999) for every vec_id < 500, run the prune at the
    // CORPUS-DERIVED nlist (Ivf.operatingPoint — SemDeDup's own √n list
    // discipline), and require near-total twin removal: near-identical
    // pairs co-cluster under any sane centroid fit, so detection must
    // not depend on the boundary-recall luck that tau-threshold pairs
    // have (those are semantic_dup_recall's contract, floor 0.25).
    val embs = Tables.load(spark, dir, "embeddings")
      .where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val planted500 = embs.filter(col("vec_id") < 500L)
      .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + (pmod(i * lit(37), lit(11)) - lit(5)).cast("float") *
            lit(0.003f)).as("embedding"))
    val nPlanted = planted500.count()
    assert(nPlanted > 0, "fixture must yield planted twins")
    val corpus = embs.unionByName(planted500)
    val op = Ivf.operatingPoint(embs.count())
    val survivors = SemDedup.semanticPrune(corpus, col("vec_id"),
      col("embedding"), minCosine = 0.5, dim = 64, nlist = op.nlist)
    val keptTwins = survivors.filter(col("vec_id") >= 1000000000L).count()
    val recall = (nPlanted - keptTwins).toDouble / nPlanted
    assert(recall >= 0.9,
      s"planted-twin recall $recall below 0.9 ($keptTwins of $nPlanted kept)")
    // and the prune never invents survivors: original corpus size bounds
    assert(survivors.count() <= embs.count() + nPlanted)
  }
}
