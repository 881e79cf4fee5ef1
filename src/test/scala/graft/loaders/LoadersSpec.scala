package graft.loaders

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

class LoadersSpec extends AnyFunSuite {

  private final class ScriptedTransport(script: Seq[Either[String, String]])
      extends HttpTransport {
    var calls: List[String] = Nil
    private var i = 0
    override def get(url: String, headers: Map[String, String],
                     timeoutMs: Int): Array[Byte] = {
      calls = calls :+ url
      val step = script(math.min(i, script.length - 1)); i += 1
      step match {
        case Left(err)   => throw new java.io.IOException(err)
        case Right(body) => body.getBytes("UTF-8")
      }
    }
  }

  private def memStore: FileObjectStore =
    new FileObjectStore(java.nio.file.Files.createTempDirectory("graft_store"))

  test("S5: retries transient failures then succeeds") {
    val t = new ScriptedTransport(Seq(Left("boom"), Left("boom"), Right("ok")))
    var slept = List.empty[Long]
    val out = Loaders.getWithRetry(t, "http://x/api", maxAttempts = 5,
      minSleepMs = 10, maxSleepMs = 20, sleep = ms => slept :+= ms)
    assert(new String(out) == "ok")
    assert(t.calls.length == 3)
    assert(slept.length == 2 && slept.forall(_ >= 10))
  }

  test("S5: gives up after maxAttempts") {
    val t = new ScriptedTransport(Seq(Left("down")))
    val e = intercept[java.io.IOException] {
      Loaders.getWithRetry(t, "http://x/api", maxAttempts = 3)
    }
    assert(e.getMessage.contains("after 3 attempts"))
    assert(t.calls.length == 3)
  }

  test("S6: offset pagination concatenates pages until reported total") {
    val all = (0 until 250).toVector
    val fetched = Loaders.offsetPaginate(100) { offset =>
      (all.slice(offset.toInt, offset.toInt + 100), all.length.toLong)
    }
    assert(fetched == all)
  }

  test("S7: cursor pagination follows next links") {
    val pages = Map(
      "p1" -> (Seq(1, 2), Some("p2")),
      "p2" -> (Seq(3), Some("p3")),
      "p3" -> (Seq(4, 5), None))
    assert(Loaders.cursorPaginate("p1")(pages) == Seq(1, 2, 3, 4, 5))
  }

  test("S8: batched multi-get slices ids into CSV chunks") {
    var params = List.empty[String]
    val out = Loaders.batchedMultiGet((1 to 7).map(_.toString), 3) { csv =>
      params :+= csv; csv.split(",").toSeq
    }
    assert(params == List("1,2,3", "4,5,6", "7"))
    assert(out == (1 to 7).map(_.toString))
  }

  test("S9: validity retry returns first valid payload or None") {
    var n = 0
    val ok = Loaders.retryUntilValid(3)(() => { n += 1; n })(_ >= 2)
    assert(ok.contains(2))
    val none = Loaders.retryUntilValid(2)(() => "bad")(_ == "good")
    assert(none.isEmpty)
  }

  test("S10: chunked download stores the full payload") {
    val store = memStore
    val payload = Array.tabulate[Byte](50000)(i => (i % 251).toByte)
    val n = Loaders.chunkedDownload(
      new java.io.ByteArrayInputStream(payload), store, "rec/file.mp4",
      chunkSize = 16384)
    assert(n == 50000)
    assert(store.list("rec/") == Seq("rec/file.mp4"))
  }

  test("S11+K4: per-date fetch stores path-encoded raw JSON") {
    val t = new ScriptedTransport(Seq(Right("""{"total_records": 1}""")))
    val store = memStore
    val key = Loaders.loadDatedLogs(t, store,
      (f, to) => s"http://api/meetings?from=$f&to=$to",
      "air-meetings-logs-20240101", "meetings_logs",
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 2))
    assert(key == "air-meetings-logs-20240101/meetings_logs_2024-01-01_2024-01-02.json")
    assert(store.list("meetings_logs") == Seq(key))
    assert(t.calls == List("http://api/meetings?from=2024-01-01&to=2024-01-02"))
  }

  test("S12: modified-since cut keeps items within the lag window") {
    case class Survey(id: Int, modified: LocalDate)
    val items = Seq(Survey(1, LocalDate.of(2024, 1, 1)),
      Survey(2, LocalDate.of(2024, 1, 9)), Survey(3, LocalDate.of(2024, 1, 10)))
    val kept = Loaders.modifiedSince(items, LocalDate.of(2024, 1, 10), 1)(_.modified)
    assert(kept.map(_.id) == Seq(2, 3))
  }
}
