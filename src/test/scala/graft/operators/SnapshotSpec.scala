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
}
