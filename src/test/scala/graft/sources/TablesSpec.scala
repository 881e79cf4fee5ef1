package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

class TablesSpec extends SparkTestBase {

  test("S2: dated glob widens 'all' to a wildcard") {
    assert(Tables.datedGlob("s3a://b/", "head-{date}*/logs_{date}*.json", "2024-01-01")
      == "s3a://b/head-2024-01-01*/logs_2024-01-01*.json")
    assert(Tables.datedGlob("s3a://b", "head-{date}*/x.json", "all")
      == "s3a://b/head-**/x.json")
  }

  test("S4: listFiles globs and substring-filters like s3_all_files") {
    val dir = tempDir("list")
    Seq("a-meetings-1.json", "a-meetings-2.json", "b-other.json").foreach { n =>
      Files.writeString(dir.resolve(n), "{}")
    }
    val all = Tables.listFiles(spark, s"$dir/*.json")
    assert(all.length == 3)
    val filtered = Tables.listFiles(spark, s"$dir/*.json", mask = "meetings")
    assert(filtered.length == 2 && filtered.forall(_.contains("meetings")))
    assert(Tables.listFiles(spark, s"$dir/nope/*.json").isEmpty)
  }

  test("S1: json scan with explicit schema skips inference") {
    val f = jsonFixture(Seq("""{"a": 1, "b": "x"}""", """{"a": 2, "b": "y"}"""), "s1")
    val inferred = Tables.json(spark, f)
    assert(inferred.count() == 2)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType)))
    val explicit = Tables.json(spark, f, Some(schema))
    assert(explicit.schema == schema && explicit.count() == 2)
  }

  test("S3: every harness table loads with rows") {
    Tables.names.foreach { name =>
      val df = Tables.load(spark, "/root/testdata/sf0.001", name)
      assert(df.count() > 0, name)
    }
  }
}
