package graft.sinks

import org.apache.spark.sql.SaveMode

import graft.SparkTestBase

/** K2/K3 against a REAL JDBC endpoint (embedded Derby, in-memory): the
  * serving path is not only mock-tested.
  */
class JdbcSinkSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JdbcSink round-trip: write, append, count, out-of-band DDL") {
    import graft.TestSpark.spark.implicits._
    val sink = new JdbcSink(url, "", "", numPartitions = 2, batchSize = 100)

    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    sink.write(df, "serving_t1", SaveMode.Overwrite)
    assert(sink.count("serving_t1") == 3)

    sink.write(df, "serving_t1", SaveMode.Append)
    assert(sink.count("serving_t1") == 6)

    // K3: raw DDL through the same connection path (Derby has no
    // IF NOT EXISTS; plain CREATE like the reference's first-run path)
    sink.execute("CREATE TABLE oob_ddl (id BIGINT, note VARCHAR(64))")
    sink.execute("INSERT INTO oob_ddl VALUES (7, 'hello')")
    assert(sink.count("oob_ddl") == 1)

    // O4: dual-sink reconcile against the real serving side
    val staging = tempDir("jdbc_staging").toString + "/t1"
    ParquetSink.write(df, staging, SaveMode.Overwrite)
    val (staged, served, ok) = Reconcile.check(spark, staging, sink, "oob_ddl")
    assert(staged == 3 && served == 1 && !ok) // counts differ -> flagged
  }
}
