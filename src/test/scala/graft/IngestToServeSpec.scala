package graft

import java.time.LocalDate

import org.apache.spark.sql.SaveMode

import graft.loaders.{FileObjectStore, HttpTransport, Loaders}
import graft.pipelines.{JhubPipeline, PipelineContext}
import graft.sinks.MockServingSink

/** Whole-system path: HTTP ingestion (S5/S11/K4, mock transport) fills
  * the raw zone, the Spark pipeline processes it into staging + serving —
  * the reference's loader→processor contract in one test.
  */
class IngestToServeSpec extends SparkTestBase {

  private val apiBody =
    """{"log": "[I 2024-01-01 10:00:00.123 JupyterHub app:200] GET /hub", "time": "2024-01-01T10:00:00.123456789Z", "kubernetes": {"container_name": "hub", "host": "n1", "pod_name": "p1", "annotations": {"a": "1"}, "labels": {"l": "1"}}}
      |{"log": "[W 2024-01-01 10:01:00.000 JupyterHub auth:403] denied", "time": "2024-01-01T10:01:00.000000000Z", "kubernetes": {"container_name": "hub", "host": "n2", "pod_name": "p2", "annotations": {"a": "1"}, "labels": {"l": "1"}}}"""
      .stripMargin

  test("loader fills the raw zone; pipeline serves it") {
    val storeRoot = tempDir("rawzone")
    val store = new FileObjectStore(storeRoot)
    val transport = new HttpTransport {
      var calls = 0
      override def get(url: String, headers: Map[String, String],
                       timeoutMs: Int): Array[Byte] = {
        calls += 1
        if (calls == 1) throw new java.io.IOException("flaky first call")
        apiBody.getBytes("UTF-8")
      }
    }

    // S5 retry + S11 dated fetch + K4 raw put
    val key = Loaders.loadDatedLogs(transport, store,
      (f, t) => s"http://api/logs?from=$f&to=$t",
      "jhub-logs-2024-01-01", "hub_logs",
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 2))
    assert(store.list("hub_logs").size == 1)

    // processor side: glob the raw zone like the reference's S1/S2
    val sink = new MockServingSink
    val ctx = new PipelineContext(spark, sink, tempDir("staging").toString,
      SaveMode.Overwrite)
    JhubPipeline.run(ctx, s"$storeRoot/jhub-logs-*/hub_logs_*.json")
    assert(ctx.failed.isEmpty, ctx.report.toString)

    val out = spark.read.parquet(s"${ctx.stagingDir}/jhublogs")
    assert(out.count() == 2 && sink.count("jhublogs") == 2)
    val codes = out.select("log_code").collect().map(_.getString(0)).toSet
    assert(codes == Set("200", "403"))
  }
}
