package graft.loaders

import java.time.{LocalDate, LocalDateTime}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Runnable CLI entry points over the tested S5-S12 loader primitives —
  * the engine's equivalents of the reference's `load_all()` scripts
  * (`zoom_load.py:208-224`, `vk_load.py:315-330`,
  * `monkey_load.py:197-216`), with the deploy-specific parts made
  * explicit instead of hard-coded: the raw-zone root is argv, API
  * base/credentials come from env vars, and the HTTP/storage seams stay
  * injectable so the flows are testable with zero egress
  * (LoaderMainsSpec scripts a mock transport).
  *
  * Arg shapes mirror the reference:
  *   ZoomLoadMain   <outDir> [date]            (default: today)
  *   VkLoadMain     <outDir> <group>           ('gsom_ma' / 'gsom.spbu' style)
  *   MonkeyLoadMain <outDir> <lagDays> [date]  (date defaults to today)
  */
object LoaderCli {
  val mapper = new ObjectMapper()

  /** The reference's path-safe timestamp mangle (zoom_load.py:217-220,
    * vk_load.py:317: ' '/':'/'.' all become '-'). Fixed-width formatter —
    * LocalDateTime.toString drops :00 seconds, which would give the same
    * loader differently-shaped keys depending on the wall clock, breaking
    * substring-mask listings tuned to one shape.
    */
  private val tsFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH-mm-ss")
  def pathTs(now: LocalDateTime): String = now.format(tsFmt)

  def store(outDir: String) =
    new FileObjectStore(java.nio.file.Paths.get(outDir))

  def bearer(token: String): Map[String, String] =
    if (token.isEmpty) Map.empty else Map("Authorization" -> s"Bearer $token")

  def parse(bytes: Array[Byte]): JsonNode = mapper.readTree(bytes)
}

/** Zoom: dated recordings-report dump, then per-meeting participants and
  * recording files (zoom_load.py load_logs_dates + load_meetings_data).
  */
object ZoomLoadMain {
  import LoaderCli._

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ZoomLoadMain <outDir> [date]")
    val date = if (args.length > 1) LocalDate.parse(args(1)) else LocalDate.now()
    val keys = run(new JdkHttpTransport, store(args(0)),
      sys.env.getOrElse("GRAFT_ZOOM_API_BASE", "https://api.zoom.us/v2"),
      sys.env.getOrElse("GRAFT_ZOOM_TOKEN", ""),
      date, LocalDateTime.now())
    keys.foreach(k => println(s"[zoom-load] $k"))
  }

  /** Returns every raw-zone key written, in write order. */
  def run(transport: HttpTransport, store: ObjectStore, apiBase: String,
          token: String, date: LocalDate, now: LocalDateTime): Seq[String] = {
    val written = Seq.newBuilder[String]
    val upfolder = s"air-meetings-logs-${pathTs(now)}" // zoom_load.py:217-220
    // S11: the dated report dump, meetings_logs_{from}_{to}.json
    // (zoom_load.py:127-146) — fetched once, stored and parsed
    val body = Loaders.getWithRetry(transport,
      s"$apiBase/accounts/me/recordings?from=$date&to=$date&page_size=300",
      bearer(token))
    val logsKey = s"$upfolder/meetings_logs_${date}_$date.json"
    store.put(logsKey, body)
    written += logsKey
    val meetings = parse(body).path("meetings")
    val rootDir = "air-meetings-data" // zoom_load.py root_dir arg
    var i = 0
    meetings.forEach { m =>
      val id = m.path("id").asText()
      // recordings: STREAMED binary download -> store (S10) — a multi-GB
      // recording never materializes in heap (getStream + putStream both
      // move fixed-size chunks)
      m.path("recording_files").forEach { rf =>
        val name = rf.path("recording_type").asText().replace("_", "-") +
          "-" + rf.path("id").asText() + "." + rf.path("file_extension").asText()
        val in = transport.getStream(rf.path("download_url").asText(),
          bearer(token), 20000)
        try Loaders.chunkedDownload(in, store, s"$rootDir/$id/$name")
        finally in.close()
        written += s"$rootDir/$id/$name"
      }
      // participants, wrapped with the meeting uuid (zoom_load.py:186-199);
      // deterministic file index instead of the reference's getrandbits(32)
      val uuid = m.path("uuid").asText()
      val pData = Loaders.getWithRetry(transport,
        s"$apiBase/metrics/meetings/$uuid/participants?page_size=300&type=past",
        bearer(token))
      val wrapped = mapper.createObjectNode()
      wrapped.put("uuid", uuid)
      wrapped.set[JsonNode]("participants_data", parse(pData))
      val pKey = s"$rootDir/$id/participants_$i.json"
      store.put(pKey, mapper.writeValueAsBytes(wrapped))
      written += pKey
      i += 1
    }
    written.result()
  }
}

/** VK: group card, offset-paginated members, offset-paginated group wall
  * (vk_load.py group_data/group_members/wall_data write_s3 flows).
  */
object VkLoadMain {
  import LoaderCli._

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: VkLoadMain <outDir> <group>")
    val keys = run(new JdkHttpTransport, store(args(0)),
      sys.env.getOrElse("GRAFT_VK_API_BASE", "https://api.vk.com/method"),
      sys.env.getOrElse("GRAFT_VK_TOKEN", ""), args(1), LocalDateTime.now())
    keys.foreach(k => println(s"[vk-load] $k"))
  }

  def run(transport: HttpTransport, store: ObjectStore, apiBase: String,
          token: String, group: String, now: LocalDateTime,
          pageSize: Int = 100): Seq[String] = {
    val written = Seq.newBuilder[String]
    val dirName = s"${group.replace(".", "_")}-${pathTs(now)}" // vk_load.py:317
    def call(method: String, params: String): JsonNode =
      parse(Loaders.getWithRetry(transport,
        s"$apiBase/$method?$params&access_token=$token&v=5.131",
        timeoutMs = 10000, maxAttempts = 3))
    // group card (vk_load.py:140-156)
    val info = call("groups.getById", s"group_id=$group&fields=description,members_count")
    store.put(s"$dirName/$group.json", mapper.writeValueAsBytes(info))
    written += s"$dirName/$group.json"
    val groupId = info.path("response").path(0).path("id").asLong()
    // members via offset pagination (S6; vk_load.py:209-247, count=100)
    val members = Loaders.offsetPaginate[JsonNode](pageSize) { offset =>
      val page = call("groups.getMembers",
        s"group_id=$group&offset=$offset&count=$pageSize")
      val items = page.path("response").path("items")
      (Seq.tabulate(items.size())(items.get(_)),
        page.path("response").path("count").asLong())
    }
    val membersDoc = mapper.createObjectNode()
    val membersResp = membersDoc.putObject("response")
    membersResp.put("count", members.size)
    val arr = membersResp.putArray("items")
    members.foreach(arr.add)
    store.put(s"$dirName/members_group_$group.json",
      mapper.writeValueAsBytes(membersDoc))
    written += s"$dirName/members_group_$group.json"
    // group wall, newest pages first like the reference (vk_load.py:163-207)
    val wall = Loaders.offsetPaginate[JsonNode](pageSize) { offset =>
      val page = call("wall.get", s"owner_id=-$groupId&offset=$offset&count=$pageSize")
      val items = page.path("response").path("items")
      (Seq.tabulate(items.size())(items.get(_)),
        page.path("response").path("count").asLong())
    }
    val wallDoc = mapper.createObjectNode()
    val wallResp = wallDoc.putObject("response")
    wallResp.put("count", wall.size)
    val wallArr = wallResp.putArray("items")
    wall.foreach(wallArr.add)
    store.put(s"$dirName/wall_owner_id_-$groupId.json",
      mapper.writeValueAsBytes(wallDoc))
    written += s"$dirName/wall_owner_id_-$groupId.json"
    written.result()
  }
}

/** SurveyMonkey: cursor-paginated survey list, modified-since cut, then
  * per-survey details and bulk responses (monkey_load.py load_all).
  */
object MonkeyLoadMain {
  import LoaderCli._

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MonkeyLoadMain <outDir> <lagDays> [date]")
    val date = if (args.length > 2) LocalDate.parse(args(2)) else LocalDate.now()
    val keys = run(new JdkHttpTransport, store(args(0)),
      sys.env.getOrElse("GRAFT_MONKEY_API_BASE", "https://api.surveymonkey.com"),
      sys.env.getOrElse("GRAFT_MONKEY_TOKEN", ""), date, args(1).toInt)
    keys.foreach(k => println(s"[monkey-load] $k"))
  }

  def run(transport: HttpTransport, store: ObjectStore, apiBase: String,
          token: String, curDate: LocalDate, lagDays: Int): Seq[String] = {
    val written = Seq.newBuilder[String]
    def get(url: String): JsonNode =
      parse(Loaders.getWithRetry(transport, url, bearer(token)))
    // survey list via links.next cursor pagination (S7; monkey_load.py:125-131)
    val listUrl = s"$apiBase/v3/surveys?include=response_count,date_created," +
      "date_modified,language,question_count&per_page=300"
    val surveys = Loaders.cursorPaginate[JsonNode](listUrl) { url =>
      val page = get(url)
      val items = page.path("data")
      val next = Option(page.path("links").path("next").asText(null))
      (Seq.tabulate(items.size())(items.get(_)), next)
    }
    val listDoc = mapper.createObjectNode()
    val dataArr = listDoc.putArray("data")
    surveys.foreach(dataArr.add)
    store.put(s"surveys_$curDate.json", mapper.writeValueAsBytes(listDoc))
    written += s"surveys_$curDate.json" // top-level key, monkey_load.py:140-141
    // S12: only surveys modified on/after curDate - lagDays get re-pulled
    val fresh = Loaders.modifiedSince(surveys, curDate, lagDays)(s =>
      LocalDate.parse(s.path("date_modified").asText().take(10)))
    fresh.foreach { s =>
      val id = s.path("id").asText()
      val href = s.path("href").asText()
      store.put(s"details/survey_$id.json",
        mapper.writeValueAsBytes(get(s"$href/details")))
      written += s"details/survey_$id.json"
      store.put(s"responses/responses_$id.json",
        mapper.writeValueAsBytes(get(s"$href/responses/bulk")))
      written += s"responses/responses_$id.json"
    }
    written.result()
  }
}
