package graft.pipelines

import java.time.{ZonedDateTime, ZoneOffset}

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.MockServingSink

class CliSpec extends AnyFunSuite {

  test("O1: mode parsing matches the reference CLI contract") {
    assert(PipelineCli.parseMode("overwrite") == SaveMode.Overwrite)
    assert(PipelineCli.parseMode("append") == SaveMode.Append)
    intercept[IllegalArgumentException](PipelineCli.parseMode("upsert"))
  }

  test("jhub previous-hour glob is zero-padded; 'all' widens") {
    val t = ZonedDateTime.of(2024, 3, 1, 0, 20, 0, 0, ZoneOffset.UTC)
    // previous hour of 00:20 on Mar 1 is 23:00 on Feb 29 (leap year)
    assert(PipelineCli.hourGlob(t, all = false) ==
      "year=2024/month=02/day=29/hour=23")
    assert(PipelineCli.hourGlob(t, all = true) ==
      "year=*/month=*/day=*/hour=*")
  }

  test("sink selection: mock without env, jdbc with it") {
    assert(PipelineCli.sinkFromEnv(Map.empty).isInstanceOf[MockServingSink])
    assert(PipelineCli.sinkFromEnv(Map("GRAFT_JDBC_URL" -> "jdbc:postgresql://x/db"))
      .isInstanceOf[graft.sinks.JdbcSink])
  }
}
