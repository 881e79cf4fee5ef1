package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust time-series anomaly detection over event counts — the
  * monitor a pipeline that ingests per-date batches (the reference's
  * daily cadence) runs to catch a broken day BEFORE it poisons the
  * store: bucket events per group, then flag buckets whose volume
  * deviates from that group's typical volume by more than `thresh`
  * robust deviations.
  *
  * Median/MAD, not mean/stddev, on purpose: one broken day IS the
  * outlier the statistic must not absorb — a mean-based z-score drags
  * the center toward the anomaly (masking) and inflates the spread
  * (swamping); the median and the median-absolute-deviation have a
  * 50 % breakdown point, so half the series can be garbage and the
  * gate still fires. The flag rule is the exact comparison
  * `|cnt − med| > thresh · mad` — counts are integers, medians of
  * integers are exact halves, so the whole decision is
  * engine-portable arithmetic (no division, no libm).
  *
  * Scale shape: the raw frame collapses to the `(group, bucket)`
  * count series in ONE map-side-combining aggregation — everything
  * after runs on `groups × buckets` rows (hours-per-year-sized, not
  * event-sized). The exact per-group percentile buffers one group's
  * BUCKET COUNTS (bounded by the calendar, never by data volume), and
  * the per-group stats frame broadcasts back onto the series.
  */
object Anomaly {

  /** Count-volume anomalies: one row per `(group, bucket)` with the
    * count, the group's median/MAD and the flag.
    */
  def robustCountAnomalies(df: DataFrame, group: Column, bucket: Column,
                           thresh: Double = 3.0): DataFrame = {
    require(thresh > 0, "thresh must be positive")
    val series = df.groupBy(group.as("group"), bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val med = series.groupBy("group")
      .agg(percentile(col("cnt"), lit(0.5)).as("med"))
    val withMed = series.join(broadcast(med), Seq("group"))
      .withColumn("adev", abs(col("cnt") - col("med")))
    val mad = withMed.groupBy("group")
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), Seq("group"))
      .select(col("group"), col("bucket"), col("cnt"), col("med"),
        col("mad"), (col("adev") > lit(thresh) * col("mad")).as("is_anomaly"))
  }
}
