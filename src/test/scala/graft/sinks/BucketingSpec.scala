package graft.sinks

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {

  test("bucketed tables join with zero shuffle") {
    import graft.TestSpark.spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i")).toDF("k", "payload")
    val dims = (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "name")

    ParquetSink.writeBucketed(facts, "b_facts", "k", 8)
    ParquetSink.writeBucketed(dims, "b_dims", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("b_facts").join(spark.table("b_dims"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1000)

      // aggregation on the bucket key also skips the exchange
      val agg = spark.table("b_facts").groupBy("k").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
