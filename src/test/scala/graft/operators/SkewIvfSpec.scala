package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewIvfSpec extends SparkTestBase {

  test("saltedJoin preserves exact join multiplicity") {
    import graft.TestSpark.spark.implicits._
    // hot key 1 on the fact side
    val fact = ((1 to 100).map(i => (1L, s"row$i")) ++ Seq((2L, "x"), (3L, "y")))
      .toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
    assert(salted.count() == plain)
    // salts actually spread the hot key
    val spread = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8)).cast("int"))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("saltedJoin with saltSource: replay-deterministic and spreads identical payloads") {
    import graft.TestSpark.spark.implicits._
    // degenerate skew: the hot key's rows are FULLY identical except the
    // unique id — a content hash would bucket them together; the id salt
    // must spread them, and being a pure function of the data it is
    // stable under any retry/replay (the SPARK-23207 hazard of the MID
    // default, documented in Skew.saltCol)
    val fact = ((1 to 100).map(i => (i.toLong, 1L, "same")) ++
      Seq((101L, 2L, "x"))).toDF("id", "k", "payload")
    val dim = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8,
      saltSource = Some(col("id")))
    assert(salted.count() == plain)
    val saltOf = (d: org.apache.spark.sql.DataFrame) => d
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(8)).cast("int"))
      .filter(col("k") === 1)
      .select("id", "__salt").as[(Long, Int)].collect().toMap
    val a = saltOf(fact)
    val b = saltOf(fact) // re-evaluated lineage: identical assignment
    assert(a == b)
    assert(a.values.toSet.size > 1, "identical payloads must still spread")
  }

  test("saltedSum equals the plain aggregation") {
    import graft.TestSpark.spark.implicits._
    val df = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      Seq(("cold", 5L), ("cold", 7L))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(df, "k", "v", salt = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("IVF: clustered corpus, probed queries recover true neighbors") {
    import graft.TestSpark.spark.implicits._
    // two well-separated clusters in 4D
    def jitter(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, j) => x + 0.01f * ((i + j) % 5) }
    val a = Array(10f, 0f, 0f, 0f)
    val b = Array(0f, 10f, 0f, 0f)
    val corpus = ((0 until 20).map(i => (i.toLong, jitter(a, i))) ++
      (20 until 40).map(i => (i.toLong, jitter(b, i)))).toDF("id", "v")

    val model = Ivf.fit(corpus, col("v"), nlist = 2)
    assert(model.centroids.count() == 2)

    val assigned = Ivf.assign(model, corpus, col("id"), col("v"))
    // each cluster lands in one list
    val listsPerCluster = assigned
      .withColumn("cluster", when(col("vec_id") < 20, 0).otherwise(1))
      .groupBy("cluster").agg(countDistinct("list_id").as("n"))
      .collect().map(_.getLong(1))
    assert(listsPerCluster.forall(_ == 1))

    val queries = corpus.filter(col("id") === 0 || col("id") === 25)
    val top = Ivf.topK(model, assigned, queries, col("id"), col("v"),
      k = 3, nprobe = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    // neighbors of a cluster-a query are cluster-a members, same for b
    assert(top.filter(_._1 == 0L).forall(_._2 < 20))
    assert(top.filter(_._1 == 25L).forall(t => t._2 >= 20 && t._2 < 40))
    assert(top.count(_._1 == 0L) == 3 && top.count(_._1 == 25L) == 3)
  }
}
