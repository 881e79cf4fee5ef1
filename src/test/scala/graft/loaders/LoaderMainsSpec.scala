package graft.loaders

import java.time.{LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end loader-main flows against a URL-routed mock transport —
  * zero egress, real pagination/cut/persistence behavior.
  */
class LoaderMainsSpec extends AnyFunSuite {

  private final class RoutedTransport(routes: PartialFunction[String, String])
      extends HttpTransport {
    var calls: List[String] = Nil
    override def get(url: String, headers: Map[String, String],
                     timeoutMs: Int): Array[Byte] = {
      calls = calls :+ url
      if (!routes.isDefinedAt(url))
        throw new java.io.IOException(s"unrouted $url")
      routes(url).getBytes("UTF-8")
    }
  }

  private def memStore: (FileObjectStore, java.nio.file.Path) = {
    val root = java.nio.file.Files.createTempDirectory("graft_lm")
    (new FileObjectStore(root), root)
  }

  private def readKey(root: java.nio.file.Path, key: String): String =
    new String(java.nio.file.Files.readAllBytes(root.resolve(key)), "UTF-8")

  private val now = LocalDateTime.of(2024, 5, 1, 12, 0, 0)

  test("ZoomLoadMain: dated logs + recordings + wrapped participants") {
    val api = "http://zoom.test/v2"
    val t = new RoutedTransport({
      case u if u.startsWith(s"$api/accounts/me/recordings") =>
        """{"meetings": [{"id": 77, "uuid": "uu-1", "recording_files": [
          |{"id": "r1", "recording_type": "shared_screen", "file_extension": "MP4",
          | "download_url": "http://zoom.test/dl/r1"}]}]}""".stripMargin
      case "http://zoom.test/dl/r1" => "BINARYVIDEO"
      case u if u.contains("/metrics/meetings/uu-1/participants") =>
        """{"participants": [{"id": "p1"}, {"id": "p2"}]}"""
    })
    val (store, root) = memStore
    val keys = ZoomLoadMain.run(t, store, api, "tok",
      LocalDate.of(2024, 5, 1), now)
    assert(keys.head.startsWith("air-meetings-logs-2024-05-01-12-00-00/") &&
      keys.head.endsWith("meetings_logs_2024-05-01_2024-05-01.json"))
    assert(keys.contains("air-meetings-data/77/shared-screen-r1.MP4"))
    assert(keys.contains("air-meetings-data/77/participants_0.json"))
    assert(store.keys.toSet == keys.toSet)
    assert(readKey(root, "air-meetings-data/77/shared-screen-r1.MP4") == "BINARYVIDEO")
    val p = LoaderCli.parse(
      readKey(root, "air-meetings-data/77/participants_0.json").getBytes("UTF-8"))
    assert(p.path("uuid").asText() == "uu-1") // the reference's uuid wrapper
    assert(p.path("participants_data").path("participants").size() == 2)
  }

  test("VkLoadMain: group card, paginated members, paginated wall") {
    val api = "http://vk.test/method"
    def membersPage(offset: Int, ids: Seq[Int], total: Int) =
      s"""{"response": {"count": $total, "items": [${ids.mkString(",")}]}}"""
    val t = new RoutedTransport({
      case u if u.startsWith(s"$api/groups.getById") =>
        """{"response": [{"id": 999, "name": "gsom"}]}"""
      case u if u.startsWith(s"$api/groups.getMembers") && u.contains("offset=0") =>
        membersPage(0, Seq(1, 2), 3)
      case u if u.startsWith(s"$api/groups.getMembers") && u.contains("offset=2") =>
        membersPage(2, Seq(3), 3)
      case u if u.startsWith(s"$api/wall.get") && u.contains("offset=0") =>
        """{"response": {"count": 1, "items": [{"id": 10, "text": "post"}]}}"""
    })
    val (store, root) = memStore
    val keys = VkLoadMain.run(t, store, api, "tok", "gsom.spbu", now, pageSize = 2)
    // dot in the group name is path-mangled (vk_load.py:317)
    assert(keys.forall(_.startsWith("gsom_spbu-2024-05-01-12-00-00/")))
    assert(keys.exists(_.endsWith("/gsom.spbu.json")))
    val members = LoaderCli.parse(readKey(root,
      keys.find(_.contains("members_group_")).get).getBytes("UTF-8"))
    val items = members.path("response").path("items")
    assert(Seq.tabulate(items.size())(items.get(_).asInt()) == Seq(1, 2, 3))
    val wall = LoaderCli.parse(readKey(root,
      "gsom_spbu-2024-05-01-12-00-00/wall_owner_id_-999.json").getBytes("UTF-8"))
    assert(wall.path("response").path("items").path(0).path("text").asText() == "post")
  }

  test("MonkeyLoadMain: cursor pagination, modified-since cut, details+responses") {
    val api = "http://monkey.test"
    val t = new RoutedTransport({
      case u if u.startsWith(s"$api/v3/surveys?") =>
        s"""{"data": [{"id": "s1", "href": "$api/v3/surveys/s1",
           | "date_modified": "2024-04-30T10:00:00"}],
           | "links": {"next": "$api/v3/surveys/page2"}}""".stripMargin
      case u if u == s"$api/v3/surveys/page2" =>
        s"""{"data": [{"id": "s2", "href": "$api/v3/surveys/s2",
           | "date_modified": "2024-01-01T10:00:00"}],
           | "links": {}}""".stripMargin
      case u if u == s"$api/v3/surveys/s1/details" => """{"id": "s1", "pages": []}"""
      case u if u == s"$api/v3/surveys/s1/responses/bulk" => """{"data": []}"""
    })
    val (store, _) = memStore
    val keys = MonkeyLoadMain.run(t, store, api, "tok",
      LocalDate.of(2024, 5, 1), lagDays = 3)
    // s1 (modified 2024-04-30, within 3 days) is re-pulled; s2 (January) is not
    assert(keys == Seq("surveys_2024-05-01.json",
      "details/survey_s1.json", "responses/responses_s1.json"))
    assert(store.keys.toSet == keys.toSet)
    assert(!t.calls.exists(_.contains("s2/details")))
  }
}
