package graft.pipelines

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sinks.MockServingSink

class CorpusPipelineSpec extends SparkTestBase {

  private def rawDocs = {
    import graft.TestSpark.spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs into the field"),
      (2L, "the quick brown fox jumps over the lazy dog and runs into the field"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog and runs into the meadow"), // near dup
      (4L, "der hund und die katze ist im haus und der garten ist gross"), // non-en
      (5L, "short text"), // too few tokens
      (6L, "a completely different and is on the document about the engines of to spark")
    ).toDF("doc_id", "text")
  }

  test("end-to-end curation: gate, exact dedup, near dedup, enrich") {
    val ctx = new PipelineContext(spark, new MockServingSink,
      tempDir("corpus").toString, SaveMode.Overwrite)
    val cfg = CorpusPipeline.Config(minQuality = 0.3, keepLangs = Seq("en"),
      minTokens = 5, shingleSize = 2, numHashes = 64, bands = 16,
      minEstJaccard = 0.5)
    val counts = CorpusPipeline.run(ctx, rawDocs, cfg)

    assert(counts("raw") == 6)
    assert(counts("gated") == 4)          // drops de doc and short doc
    assert(counts("exact_deduped") == 3)  // drops exact dup (id 2)
    assert(counts("curated") == 2)        // near-dedup drops id 3

    val curated = spark.read.parquet(s"${ctx.stagingDir}/corpus_curated")
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 6L))
    // enrichment artifacts present and well-formed
    val r = curated.filter(col("doc_id") === 1).head()
    assert(r.getAs[scala.collection.Seq[Long]]("fingerprints").nonEmpty)
    assert(r.getAs[scala.collection.Seq[Double]]("features").length == 16)
    assert(r.getAs[String]("lang_pred") == "en")
  }

  test("cluster products derive from the STORED label table, not a recompute") {
    // the production path behind dedup_cluster_sizes: materialize the
    // (doc_id, component) cluster view once, then every cluster-level
    // product is an agg over that table — here the size histogram via
    // Dedup.clusterSizeHistogram, checked against the from-scratch form
    import graft.operators.Dedup
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, minJaccard = 0.5)
    val cc = Dedup.connectedComponents(pairs)
    val labels = docs.select(col("doc_id"))
      .join(cc, docs("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("component"))
    val labelDir = s"${tempDir("labels")}/dedup_clusters"
    labels.write.mode(SaveMode.Overwrite).parquet(labelDir)

    val fromStore = Dedup.clusterSizeHistogram(
      spark.read.parquet(labelDir), col("component"))
    // the stored-label derivation is one join-free two-agg plan
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = toMap(Dedup.clusterSizeHistogram(labels, col("component")))
    assert(toMap(fromStore) == expected, s"expected $expected")
    assert(expected.nonEmpty && expected.keySet.exists(_ >= 2),
      s"fixture should contain a real multi-doc cluster: $expected")
    spark.catalog.clearCache()
  }
}
