package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

class MinHashUnionAggSpec extends SparkTestBase {

  test("group signature equals element-wise min of member signatures") {
    import graft.TestSpark.spark.implicits._
    val docs = Seq(
      (1L, "g1", "alpha beta gamma delta"),
      (2L, "g1", "beta gamma delta epsilon"),
      (3L, "g2", "one two three four")).toDF("id", "grp", "text")
    val sigs = Dedup.minhashSignatures(docs, col("id"), col("text"),
      numHashes = 32, shingleSize = 2)
      .join(docs.select(col("id").as("doc_id"), col("grp")), "doc_id")

    val grouped = sigs.groupBy("grp")
      .agg(MinHashUnionAgg.minhashUnion(col("sig"), 32).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    val members = sigs.collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[scala.collection.Seq[Long]]("sig")))
    val expectedG1 = members.filter(_._1 == "g1").map(_._2)
      .reduce((a, b) => a.zip(b).map { case (x, y) => math.min(x, y) })
    assert(grouped("g1").toSeq == expectedG1.toSeq)
    assert(grouped("g2").toSeq ==
      members.filter(_._1 == "g2").head._2.toSeq)
  }

  test("union signature estimates union Jaccard (identical groups -> 1.0)") {
    import graft.TestSpark.spark.implicits._
    val docs = Seq(
      (1L, "a", "the quick brown fox jumps high"),
      (2L, "b", "the quick brown fox jumps high")).toDF("id", "grp", "text")
    val sigs = Dedup.minhashSignatures(docs, col("id"), col("text"), 64, 2)
      .join(docs.select(col("id").as("doc_id"), col("grp")), "doc_id")
    val g = sigs.groupBy("grp")
      .agg(MinHashUnionAgg.minhashUnion(col("sig"), 64).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(g("a") == g("b"))
  }
}
