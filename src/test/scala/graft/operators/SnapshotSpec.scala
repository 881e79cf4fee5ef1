package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SnapshotSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  test("diff classifies added/removed/changed/unchanged; null content is not presence") {
    val old = Seq[(Long, Option[String])](
      (1L, Some("same")), (2L, Some("before")), (3L, Some("gone")),
      (4L, None), (5L, None)
    ).toDF("id", "text")
    val neu = Seq[(Long, Option[String])](
      (1L, Some("same")), (2L, Some("after")), (6L, Some("fresh")),
      (4L, None), (5L, Some("filled"))
    ).toDF("id", "text")
    val got = Snapshot.diff(old, neu, col("id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      // null content on both sides is an UNCHANGED row, not an
      // add/remove (the presence flags exist exactly for this)
      4L -> "unchanged", 5L -> "changed", 6L -> "added"))
  }

  test("diffSummary counts match diff; digest content gives the same classes") {
    val old = (1L to 50L).map(i => (i, s"doc $i")).toDF("id", "text")
    val neu = ((3L to 52L).map(i =>
      (i, if (i % 7 == 0) s"doc $i edited" else s"doc $i"))).toDF("id", "text")
    val summary = Snapshot.diffSummary(old, neu, col("id"), col("text"))
      .as[(String, Long)].collect().toMap
    assert(summary("added") == 2 && summary("removed") == 2)
    assert(summary("changed") + summary("unchanged") == 48)
    // digest form (the wide-row scale path) classifies identically
    val viaDigest = Snapshot.diff(old, neu, col("id"), xxhash64(col("text")))
      .as[(Long, String)].collect().toMap
    val viaText = Snapshot.diff(old, neu, col("id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(viaDigest == viaText)
  }

  private def deriveStats(d: org.apache.spark.sql.DataFrame) =
    d.select(col("id"), length(col("text")).as("n_chars"),
      size(split(col("text"), " ")).as("n_tokens"))

  test("incrementalRefresh == full recompute; derive never sees survivors") {
    val old = (1L to 60L).map(i => (i, s"doc number $i body")).toDF("id", "text")
    val neu = ((5L to 64L).map(i =>
      (i, if (i % 7 == 0) s"doc number $i body edited twice" // changed
          else s"doc number $i body"))).toDF("id", "text")
    val prev = deriveStats(old)
    val survivorIds = (5L to 64L).filter(i => i <= 60 && i % 7 != 0)
    // POISONED derive: throws in-plan if any survivor id reaches it —
    // pins the IVM contract that unchanged rows are never re-derived.
    // The poison rides INSIDE a projected column (the shape of a real
    // derive kernel) rather than a where(): a deterministic FILTER is
    // fair game for pushdown below the semi join, but project
    // expressions are only ever evaluated on the join's output rows —
    // which is exactly the property the scale claim rests on.
    def poisoned(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"),
        when(assert_true(!col("id").isin(survivorIds: _*),
          concat(lit("derive saw survivor id "), col("id"))).isNull,
          length(col("text"))).as("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"))
    val got = Snapshot.incrementalRefresh(prev, old, neu, "id",
      col("text"), poisoned)
    val full = deriveStats(neu)
    assert(got.count() == 60)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
  }

  test("incrementalRefresh drops removed ids and fails loudly on derive schema drift") {
    val old = (1L to 10L).map(i => (i, s"d $i")).toDF("id", "text")
    val neu = (6L to 10L).map(i => (i, s"d $i")).toDF("id", "text")
    val refreshed = Snapshot.incrementalRefresh(deriveStats(old), old, neu,
      "id", col("text"), deriveStats)
    assert(refreshed.select("id").as[Long].collect().sorted
      .sameElements(6L to 10L))
    // a derive whose output schema drifted from the stored table must
    // throw at plan assembly (unionByName), not write a corrupt union
    val drifted = intercept[org.apache.spark.sql.AnalysisException] {
      Snapshot.incrementalRefresh(deriveStats(old), old, neu, "id",
        col("text"),
        d => d.select(col("id"), length(col("text")).as("other_col")))
    }
    assert(drifted.getMessage.toLowerCase.contains("n_chars") ||
      drifted.getMessage.toLowerCase.contains("other_col"))
  }

  test("incrementalRefreshAgg == full recompute through group moves and emptied groups") {
    // encode (group, value) in the content so the diff sees changes:
    // text = "<grp> <value-padding>"
    def snap(rows: Seq[(Long, String, Int)]) =
      rows.map { case (id, g, v) => (id, g, v, s"$g ${"x" * v}") }
        .toDF("id", "grp", "v", "text")
    val old = snap(Seq(
      (1L, "a", 5), (2L, "a", 7), (3L, "b", 11), (4L, "b", 2),
      (5L, "c", 9))) // c will EMPTY (5 removed)
    val neu = snap(Seq(
      (1L, "a", 5),            // unchanged
      (2L, "b", 7),            // GROUP MOVE a -> b
      (3L, "b", 13),           // value change within b
      (4L, "b", 2),            // unchanged
      (6L, "d", 4)))           // new group d
    val prev = old.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v").cast("long")).as("sum_value"))
    val got = Snapshot.incrementalRefreshAgg(prev, old, neu, "id",
        col("text"), "grp", col("v"))
      .as[(String, Long, Long)].collect().toSet
    val full = neu.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v").cast("long")).as("sum_value"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == full)
    assert(!got.exists(_._1 == "c")) // emptied group gone, not (0, 0)
    assert(got.contains(("b", 3L, 22L))) // move + change landed
  }
}
