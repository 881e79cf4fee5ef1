package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeStatsSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  test("pair counts match a hand count across documents") {
    val d = Seq(
      "the cat sat",          // (the,cat) (cat,sat)
      "the cat ran",          // (the,cat) (cat,ran)
      "a the cat"             // (a,the) (the,cat)
    ).toDF("text")
    val got = BpeStats.pairCounts(d, col("text"), k = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(got.head == (("the", "cat", 3L)))
    assert(got.toSet == Set(
      ("the", "cat", 3L), ("a", "the", 1L), ("cat", "ran", 1L),
      ("cat", "sat", 1L)))
    // deterministic total order: cnt desc, then (a, b) ascending
    assert(got == got.sortBy(p => (-p._3, p._1, p._2)))
  }

  test("k cuts at a deterministic boundary under ties") {
    val d = Seq("b c", "a b", "c d").toDF("text") // three pairs, all cnt 1
    val got = BpeStats.pairCounts(d, col("text"), k = 2)
      .as[(String, String, Long)].collect().toSeq
    // tie broken by (a, b) ascending: (a,b) then (b,c) survive the cut
    assert(got == Seq(("a", "b", 1L), ("b", "c", 1L)))
  }

  test("applyMerge is greedy left-to-right over non-overlapping pairs") {
    val d = Seq(Seq("a", "a", "a"), Seq("x", "a", "a", "y", "a"))
      .toDF("toks")
    val got = d.select(BpeStats.applyMerge(col("toks"), "a", "a", sep = "+"))
      .as[Seq[String]].collect().toSeq
    // "a a a" -> [a+a, a]: the merged right element can't start a new pair
    assert(got == Seq(Seq("a+a", "a"), Seq("x", "a+a", "y", "a")))
    // null elements pass through untouched
    val withNull = Seq(Seq(Some("a"), None, Some("a"))).toDF("toks")
      .select(BpeStats.applyMerge(col("toks"), "a", "a"))
      .as[Seq[Option[String]]].collect().head
    assert(withNull == Seq(Some("a"), None, Some("a")))
  }

  test("trainMerges learns the hand-computed merge sequence") {
    // corpus: "l o w", "l o w", "l o w e r" — classic BPE toy.
    // step 1: (l,o) x3 wins; step 2: (lo,w) x3 wins
    val d = Seq("l o w", "l o w", "l o w e r").toDF("text")
    val merges = BpeStats.trainMerges(d, col("text"), steps = 2)
    assert(merges == Seq(("l", "o"), ("lo", "w")))
    // a fully merged corpus stops early instead of looping
    val tiny = Seq("a b").toDF("text")
    assert(BpeStats.trainMerges(tiny, col("text"), steps = 5) ==
      Seq(("a", "b")))
    // persistEvery exercised: same result through the cached anchor path
    val viaPersist = BpeStats.trainMerges(d, col("text"), steps = 2,
      persistEvery = 1)
    assert(viaPersist == Seq(("l", "o"), ("lo", "w")))
  }

  test("trainMerges keeps the analyzed plan bounded across steps (lineage truncation)") {
    // 30 distinct tokens -> 20 merge steps always find a pair. Without
    // eager truncation the analyzed plan gains one merge-kernel Project
    // per step (~steps + 2 nodes by step 20); with persistEvery=4 the
    // plan is a checkpoint leaf plus at most persistEvery kernels, so
    // the per-step analysis cost the driver pays is O(1) in completed
    // merges — the property that makes a 30k-merge vocab build linear.
    val d = Seq((1 to 30).map(i => s"t$i").mkString(" ")).toDF("text")
    var maxNodes = 0
    val merges = BpeStats.trainMergesProbed(d, col("text"), steps = 20,
      sep = "", persistEvery = 4,
      probe = f => {
        val n = f.queryExecution.analyzed.collect { case p => p }.size
        maxNodes = math.max(maxNodes, n)
      })
    assert(merges.size == 20)
    assert(maxNodes <= 8, // leaf + <=persistEvery kernel Projects + slack
      s"analyzed plan grew to $maxNodes nodes — lineage truncation broken")
  }

  test("sub-2-token and null documents contribute nothing; empties are tokens") {
    val d = Seq[Option[String]](
      Some("solo"), Some(""), None,
      Some("x  y") // double space -> tokens x, "", y -> pairs (x,"") ("",y)
    ).toDF("text")
    val got = BpeStats.pairCounts(d, col("text"), k = 10)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("x", "", 1L), ("", "y", 1L)))
  }

  test("encode applies the merge table identically to folding applyMerge") {
    val d = Seq((1L, "a b a b c a b"), (2L, "b c b c b c")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "c"), ("b", "c"))
    val viaKernel = BpeStats.encode(d, col("doc_id"), col("text"), merges)
      .orderBy("doc_id").select("tokens").as[Seq[String]].collect().toSeq
    val folded = d.select(col("doc_id"),
        merges.foldLeft(split(col("text"), " ")) { case (c, (a, b)) =>
          BpeStats.applyMerge(c, a, b)
        }.as("tokens"))
      .orderBy("doc_id").select("tokens").as[Seq[String]].collect().toSeq
    assert(viaKernel == folded)
    // and the semantics are the expected greedy cascade: (a,b) rewrites
    // to [ab ab c ab]; (ab,c) then merges only at position 2 (the first
    // ab pairs with another ab, not with c) -> [ab abc ab]
    assert(viaKernel.head == Seq("ab", "abc", "ab"))
    assert(viaKernel(1) == Seq("bc", "bc", "bc"))
  }

  test("encode with trained merges shrinks token counts, never grows them") {
    val docs = Seq((1L, "x y x y x y z"), (2L, "x y z x y z")).toDF("doc_id", "text")
    val merges = BpeStats.trainMerges(docs, col("text"), steps = 2)
    assert(merges.nonEmpty)
    val enc = BpeStats.encode(docs, col("doc_id"), col("text"), merges)
      .select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    assert(enc(1L) < 7 && enc(2L) < 6)
  }

  test("encode with an empty merge table is the identity tokenization") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = BpeStats.encode(d, col("doc_id"), col("text"), Seq.empty)
      .select("tokens").as[Seq[String]].head()
    assert(got == Seq("a", "b", "c"))
  }
}
