package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** F1: the four reference formats + epoch seconds + the events ns→µs
  * conversion; unparseable input must yield null (to_timestamp contract).
  */
class TimestampsSpec extends SparkTestBase {

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("ISO Zulu") {
    assert(one(Timestamps.parseIsoZulu(lit("2022-01-31T23:59:58Z"))) ==
      Timestamp.valueOf("2022-01-31 23:59:58"))
  }

  test("ISO no-zone") {
    assert(one(Timestamps.parseIsoNoZone(lit("2021-12-26T10:40:00"))) ==
      Timestamp.valueOf("2021-12-26 10:40:00"))
  }

  test("fluent-bit nanos truncates to micros") {
    assert(one(Timestamps.parseFluentBitNanos(
      lit("2022-01-01T00:00:00.123456789Z"))) ==
      Timestamp.valueOf("2022-01-01 00:00:00.123456"))
  }

  test("plain millis") {
    assert(one(Timestamps.parsePlainMillis(lit("2022-01-01 12:00:00.500"))) ==
      Timestamp.valueOf("2022-01-01 12:00:00.5"))
  }

  test("epoch seconds cast") {
    assert(one(Timestamps.parseEpochSeconds(lit(1700000000L))) ==
      Timestamp.valueOf("2023-11-14 22:13:20"))
  }

  test("unparseable and null input yield null") {
    assert(one(Timestamps.parseIsoZulu(lit("not a date"))) == null)
    assert(one(Timestamps.parseIsoZulu(lit(null).cast("string"))) == null)
    assert(one(Timestamps.parsePlainMillis(lit("2022-01-31T23:59:58Z"))) == null)
  }

  test("nanos->timestamp is exact above 2^53 (no double rounding)") {
    val nanos = 1700000000123456789L // ~1.7e18, beyond double precision
    assert(one(Timestamps.nanosToTimestamp(lit(nanos))) ==
      Timestamp.valueOf("2023-11-14 22:13:20.123456"))
  }
}
