package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

import graft.pipelines.JhubPipeline

/** Structured Streaming extension (SURVEY §7.4): the reference's
  * incrementality is calendar-batch (previous-hour globs,
  * jhub_proc.py:268-276); the natural Spark-first upgrade is a file
  * stream with checkpointed source tracking — same transform, the
  * engine's file-source log replaces the manual hour masks.
  */
object Streams {

  /** Streaming variant of the jhub pipeline: watch `inputDir` for new
    * fluent-bit JSON, apply the SAME batch transform (the lineage is
    * identical — one definition serves both modes), write parquet with
    * exactly-once file-sink semantics.
    *
    * `Trigger.AvailableNow` drains everything present then stops — the
    * scheduled-batch replacement; pass a processing-time trigger for a
    * long-running daemon.
    */
  def jhubStream(spark: SparkSession, inputDir: String, schema: StructType,
                 outDir: String, checkpointDir: String,
                 trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] = {
    val raw = spark.readStream.schema(schema).json(inputDir)
    JhubPipeline.transform(raw)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
  }

  /** Watermarked tumbling-window event counts — the streaming twin of the
    * q_events_hourly batch query: 1-hour windows, late data admitted up
    * to `lateness`, per-window per-type counts and exact decimal value
    * sums. Works on any streaming DataFrame with (ts, event_type, value).
    */
  def eventCountsHourly(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("event_hour"), col("event_type"),
        col("n_events"), col("sum_value"))
}
