package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe for data-type behavior (nanos timestamps etc). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    ev.printSchema()
    ev.show(3, false)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.selectExpr("doc_id", "length(text)", "n_chars", "size(split(text, ' '))").show(3)
    spark.stop()
  }
}
