package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKAggSpec extends SparkTestBase {

  test("topK keeps the k best with deterministic tie-break") {
    import graft.TestSpark.spark.implicits._
    val df = Seq(
      ("q1", 0.9, 10L), ("q1", 0.95, 11L), ("q1", 0.9, 9L), ("q1", 0.1, 12L),
      ("q2", 0.5, 20L)).toDF("query_id", "cosine", "neighbor_id")
    val top = df.groupBy("query_id")
      .agg(TopKAgg.topK(col("cosine"), col("neighbor_id"), 3).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getStruct(2).getDouble(0), r.getStruct(2).getLong(1)))
    val q1 = top.filter(_._1 == "q1").sortBy(_._2)
    // 0.95 first, then the two 0.9s with LOWER id first
    assert(q1.map(t => (t._3, t._4)).toSeq ==
      Seq((0.95, 11L), (0.9, 9L), (0.9, 10L)))
    assert(top.count(_._1 == "q2") == 1)
  }

  test("heap aggregate matches the window formulation on real data") {
    import org.apache.spark.sql.expressions.Window
    val embs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = embs.filter(col("vec_id") % 100 === 0)
    val viaAgg = graft.operators.Similarity.bruteForceTopK(embs, col("vec_id"),
      col("embedding"), q, col("vec_id"), col("embedding"), k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: window + row_number over the same scores
    val c = embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(
        q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("buffer trims beyond 4k entries without losing the best") {
    val buf = new TopKAgg.Buf(2)
    (1 to 100).foreach(i => buf.add(i.toDouble, i.toLong))
    val top = buf.sortedTop
    assert(top.toSeq == Seq((100.0, 100L), (99.0, 99L)))
  }
}
