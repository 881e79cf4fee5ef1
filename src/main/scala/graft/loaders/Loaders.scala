package graft.loaders

import java.time.LocalDate

/** HTTP ingestion layer — the reference's loader family
  * (zoom_load.py / vk_load.py / monkey_load.py), re-expressed as plain
  * Scala with the I/O behind small traits so the logic is testable with
  * zero egress. This code is deliberately OUTSIDE the Spark data plane
  * (SURVEY §2.1 S5-S12, §2.2 K4): it feeds the raw zone that the
  * pipelines then read.
  */

/** Minimal HTTP transport; production uses [[JdkHttpTransport]], tests
  * script a mock. Implementations throw on transport errors (the retry
  * wrapper treats any exception as retryable, like the reference's broad
  * except clauses, zoom_load.py:96-118).
  */
trait HttpTransport {
  def get(url: String, headers: Map[String, String], timeoutMs: Int): Array[Byte]

  /** Streaming GET for large payloads (recordings): implementations that
    * can should return the response body WITHOUT materializing it. The
    * default buffers via [[get]] — fine for JSON, wrong for video; the
    * JDK transport overrides with a true stream.
    */
  def getStream(url: String, headers: Map[String, String],
                timeoutMs: Int): java.io.InputStream =
    new java.io.ByteArrayInputStream(get(url, headers, timeoutMs))
}

/** Error messages must never echo credentials: both query-string tokens
  * (VK's access_token) and urls appear in thrown messages and logs.
  */
private[loaders] object Redact {
  def url(u: String): String =
    u.replaceAll("(access_token|token|key)=[^&]*", "$1=REDACTED")
}

/** java.net.http-based transport (JDK built-in; no extra dependencies). */
final class JdkHttpTransport extends HttpTransport {
  private lazy val client = java.net.http.HttpClient.newHttpClient()

  private def request(url: String, headers: Map[String, String],
                      timeoutMs: Int): java.net.http.HttpRequest = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs.toLong)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    b.build()
  }

  override def get(url: String, headers: Map[String, String],
                   timeoutMs: Int): Array[Byte] = {
    val resp = client.send(request(url, headers, timeoutMs),
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() >= 400)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} for ${Redact.url(url)}")
    resp.body()
  }

  override def getStream(url: String, headers: Map[String, String],
                         timeoutMs: Int): java.io.InputStream = {
    val resp = client.send(request(url, headers, timeoutMs),
      java.net.http.HttpResponse.BodyHandlers.ofInputStream())
    if (resp.statusCode() >= 400) {
      resp.body().close()
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} for ${Redact.url(url)}")
    }
    resp.body()
  }
}

/** K4: raw-zone persistence (the reference's S3 put_object). */
trait ObjectStore {
  def put(key: String, bytes: Array[Byte]): Unit
  /** Streaming put for large payloads; returns bytes written. The default
    * buffers (fine for API-response JSON); file/S3 stores override with a
    * true streaming copy.
    */
  def putStream(key: String, in: java.io.InputStream,
                chunkSize: Int = 16384): Long = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](chunkSize)
    var n = in.read(chunk)
    var total = 0L
    while (n > 0) { buf.write(chunk, 0, n); total += n; n = in.read(chunk) }
    put(key, buf.toByteArray)
    total
  }
  def keys: Seq[String]
  /** S4-adjacent: substring-filtered listing (zoom_proc.py:258-264). */
  def list(mask: String): Seq[String] = keys.filter(_.contains(mask))
}

/** Local-filesystem store for tests and on-prem runs. */
final class FileObjectStore(root: java.nio.file.Path) extends ObjectStore {
  override def put(key: String, bytes: Array[Byte]): Unit = {
    val p = root.resolve(key)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
  }
  /** True streaming copy — constant memory regardless of payload size. */
  override def putStream(key: String, in: java.io.InputStream,
                         chunkSize: Int): Long = {
    val p = root.resolve(key)
    java.nio.file.Files.createDirectories(p.getParent)
    val out = java.nio.file.Files.newOutputStream(p)
    try {
      val chunk = new Array[Byte](chunkSize)
      var total = 0L
      var n = in.read(chunk)
      while (n > 0) { out.write(chunk, 0, n); total += n; n = in.read(chunk) }
      total
    } finally out.close()
  }
  override def keys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(root)) Seq.empty
    else {
      val walk = java.nio.file.Files.walk(root) // must be closed (javadoc)
      try walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => root.relativize(p).toString).toSeq.sorted
      finally walk.close()
    }
  }
}

object Loaders {

  /** S5: GET with bounded retries and randomized sleep — the reference's
    * get_content (zoom_load.py:90-125, MAX_COUNTS=5, randomized
    * MIN..MAX_TIME_SLEEP scaled by attempt, vk_load.py:106-108).
    * Deterministically seeded so tests are stable.
    */
  def getWithRetry(transport: HttpTransport, url: String,
                   headers: Map[String, String] = Map.empty,
                   timeoutMs: Int = 20000, maxAttempts: Int = 5,
                   minSleepMs: Long = 0L, maxSleepMs: Long = 0L,
                   seed: Long = 42L,
                   sleep: Long => Unit = Thread.sleep): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return transport.get(url, headers, timeoutMs)
      catch {
        case e: Throwable =>
          last = e
          attempt += 1
          if (attempt < maxAttempts && maxSleepMs > minSleepMs)
            sleep((minSleepMs + rnd.nextLong(maxSleepMs - minSleepMs)) * attempt)
      }
    }
    throw new java.io.IOException(
      s"giving up on ${Redact.url(url)} after $maxAttempts attempts", last)
  }

  /** S6: offset pagination — advance `offset += pageSize` until the
    * reported total is exhausted, concatenating page items (the
    * client-side UNION ALL of vk_load.py:163-207).
    * `fetch(offset)` returns (items of this page, total count).
    */
  def offsetPaginate[A](pageSize: Int)(fetch: Long => (Seq[A], Long)): Seq[A] = {
    val out = Seq.newBuilder[A]
    var offset = 0L
    var total = Long.MaxValue
    while (offset < total) {
      val (items, reported) = fetch(offset)
      out ++= items
      total = reported
      offset += pageSize
      if (items.isEmpty && offset < total) total = 0L // defensive stop
    }
    out.result()
  }

  /** S7: cursor pagination — follow the `links.next` URL until absent
    * (monkey_load.py:125-131).
    */
  def cursorPaginate[A](first: String)(fetch: String => (Seq[A], Option[String])): Seq[A] = {
    val out = Seq.newBuilder[A]
    var next: Option[String] = Some(first)
    while (next.isDefined) {
      val (items, n) = fetch(next.get)
      out ++= items
      next = n
    }
    out.result()
  }

  /** S8: batched multi-get — slice an id list into `batchSize`-sized CSV
    * parameters, one request per slice (vk_load.py:250-290).
    */
  def batchedMultiGet[A](ids: Seq[String], batchSize: Int)(fetch: String => Seq[A]): Seq[A] =
    ids.grouped(batchSize).flatMap(chunk => fetch(chunk.mkString(","))).toSeq

  /** S9: response-validity retry — re-request until the payload satisfies
    * `valid` or attempts are exhausted (vk_load.py:118-135, 'response' in
    * data with MAX_COUNTS_DATA=2).
    */
  def retryUntilValid[A](maxAttempts: Int)(fetch: () => A)(valid: A => Boolean): Option[A] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val a = fetch()
      if (valid(a)) return Some(a)
      attempt += 1
    }
    None
  }

  /** S10: chunked binary download → store, streamed in `chunkSize`
    * pieces (zoom_load.py:148-206 streams recordings the same way) —
    * memory stays constant however large the payload when the store
    * implements a true streaming put (FileObjectStore does).
    */
  def chunkedDownload(in: java.io.InputStream, store: ObjectStore, key: String,
                      chunkSize: Int = 16384): Long =
    store.putStream(key, in, chunkSize)

  /** S11: per-date fetch → raw JSON put, with the reference's path-encoded
    * metadata ({upfolder}/{name}_{from}_{to}.json, zoom_load.py:134-141).
    */
  def loadDatedLogs(transport: HttpTransport, store: ObjectStore,
                    urlFor: (LocalDate, LocalDate) => String,
                    upfolder: String, name: String,
                    from: LocalDate, to: LocalDate): String = {
    val body = getWithRetry(transport, urlFor(from, to))
    val key = s"$upfolder/${name}_${from}_${to}.json"
    store.put(key, body)
    key
  }

  /** S12: modified-since incremental cut — keep only items whose
    * date_modified is on/after `cutDate` = today minus `lagDays`
    * (monkey_load.py:153-174, 198-213).
    */
  def modifiedSince[A](items: Seq[A], today: LocalDate, lagDays: Int)
                      (modifiedDate: A => LocalDate): Seq[A] = {
    val cut = today.minusDays(lagDays.toLong)
    items.filter(a => !modifiedDate(a).isBefore(cut))
  }
}
