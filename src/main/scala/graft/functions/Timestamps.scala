package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The reference's four source timestamp encodings plus the formatless
  * epoch-seconds overload (reference zoom_proc.py:141-144, monkey_proc.py:
  * 129-136, vk_proc.py:170-173, jhub_proc.py:162-169). Unparseable values
  * yield null, matching `F.to_timestamp` semantics. Session timezone is
  * pinned UTC by the engine (build.sbt).
  */
object Timestamps {
  /** ISO-8601 Zulu, e.g. 2022-01-31T23:59:59Z (zoom_proc.py:143). */
  val IsoZulu = "yyyy-MM-dd'T'HH:mm:ss'Z'"
  /** ISO-8601 without zone (monkey_proc.py:131). */
  val IsoNoZone = "yyyy-MM-dd'T'HH:mm:ss"
  /** fluent-bit nanosecond logs (jhub_proc.py:164). */
  val FluentBitNanos = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS'Z'"
  /** plain millisecond logs (jhub_proc.py:168). */
  val PlainMillis = "yyyy-MM-dd HH:mm:ss.SSS"

  // try_to_timestamp, not to_timestamp: Spark 4 runs ANSI mode by default,
  // where to_timestamp THROWS on unparseable input. The reference ran
  // Spark 3 with ANSI off and silently produced null (jhub fallback rows
  // depend on this), so the try_ variant is the faithful port.
  def parseIsoZulu(c: Column): Column = try_to_timestamp(c, lit(IsoZulu))
  def parseIsoNoZone(c: Column): Column = try_to_timestamp(c, lit(IsoNoZone))
  def parseFluentBitNanos(c: Column): Column = try_to_timestamp(c, lit(FluentBitNanos))
  def parsePlainMillis(c: Column): Column = try_to_timestamp(c, lit(PlainMillis))

  /** Epoch seconds (integral column) → timestamp (vk_proc.py:170-173 uses
    * formatless `F.to_timestamp` on a long, which casts).
    */
  def parseEpochSeconds(c: Column): Column = c.cast(TimestampType)

  /** Nanoseconds-since-epoch long → microsecond timestamp, truncating —
    * matches how a ns-precision parquet column compares across engines
    * that are µs-native. Integer division via decimal: `c / 1000` on a
    * Column is double division, which loses precision above 2^53 (epoch
    * nanos are ~1.7e18), so it must stay exact all the way.
    */
  def nanosToTimestamp(c: Column): Column = {
    val micros = c.cast(org.apache.spark.sql.types.DecimalType(25, 0))
      .divide(lit(1000)).cast("long") // decimal → long truncates toward zero
    timestamp_micros(micros)
  }
}
