package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{LogParse, Timestamps}
import graft.operators.Flatten
import graft.sinks.Contract
import graft.sources.Tables

/** JupyterHub log pipeline — the reference's smallest processor
  * (jhub_proc.py:122-336): fluent-bit JSON → kuber_ flatten → drop noisy
  * k8s maps → sqbrackets log parse → 6-way unpack → two timestamp parses
  * → 10-column contract → dual sink.
  */
object JhubPipeline {

  val jhublogs: Contract = Contract("jhublogs", StructType(Seq(
    StructField("time_stamp", TimestampType),
    StructField("kuber_container_name", StringType),
    StructField("kuber_host", StringType),
    StructField("kuber_pod_name", StringType),
    StructField("log_head", StringType),
    StructField("log_timestamp", TimestampType),
    StructField("log_service", StringType),
    StructField("log_type", StringType),
    StructField("log_code", StringType),
    StructField("log_msg", StringType))))

  /** Pure transform: raw fluent-bit records → jhublogs rows
    * (jhub_proc.py:123-172 semantics).
    */
  def transform(raw: DataFrame): DataFrame = {
    val flat = Flatten.flatten(raw, Some("kuber_"))
      .drop("kuber_annotations", "kuber_labels")
    val parsed = flat.withColumn("log_msg", LogParse.sqbracketsCol(col("log")))
    parsed.select(
      col("time").as("time_stamp"),
      col("kuber_container_name"),
      col("kuber_host"),
      col("kuber_pod_name"),
      col("log_msg").getItem(0).as("log_head"),
      col("log_msg").getItem(1).as("log_timestamp"),
      col("log_msg").getItem(2).as("log_service"),
      col("log_msg").getItem(3).as("log_type"),
      col("log_msg").getItem(4).as("log_code"),
      col("log_msg").getItem(5).as("log_msg"))
      .withColumn("time_stamp", Timestamps.parseFluentBitNanos(col("time_stamp")))
      .withColumn("log_timestamp", Timestamps.parsePlainMillis(col("log_timestamp")))
  }

  /** End-to-end run over an input glob (the reference's hour-partitioned
    * path, jhub_proc.py:257-276, is just a narrower glob).
    */
  def run(ctx: PipelineContext, inputGlob: String): Unit =
    ctx.guard("jhublogs_source") {
      val raw = Tables.json(ctx.spark, inputGlob)
      ctx.stage("jhublogs") {
        ctx.saveTable(transform(raw), jhublogs)
      }
    }
}
