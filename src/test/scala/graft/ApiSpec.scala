package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.streaming.{Api, InMemoryKvStore, Keys}

/** The HTTP/SSE serving shell: REST snapshot routes serve the
  * reference-shaped payloads read back from the KV store, and the SSE
  * stream frames fetch-on-notify events exactly as the reference's SSE
  * manager encodes them (`event: <name>\ndata: <json>\n\n`).
  */
class ApiSpec extends SparkSpec {

  private def get(port: Int, path: String): String = {
    val client = HttpClient.newHttpClient()
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()
  }

  test("REST snapshot routes serve reference-shaped payloads and defaults") {
    val kv = new InMemoryKvStore
    val server = Api.start(kv)
    val port = server.getAddress.getPort
    try {
      // empty store: zeroed default shapes (reference redis_service.py)
      val empty = get(port, "/api/metrics")
      assert(empty.contains("\"activeUsers\":0") && empty.contains("\"updatedAt\":0"))
      assert(get(port, "/api/regions") == "[]")
      assert(get(port, "/api/traffic") == "[]")
      val emptyHealth = get(port, "/api/health")
      assert(emptyHealth.contains("\"apiClusterStatus\":\"DOWN\""))
      val emptyGeo = get(port, "/api/geo")
      assert(emptyGeo.contains("\"engineVersion\":\"V4-Orbit\""))

      // populated store: values re-typed, lists ordered per contract
      kv.writeHash(Keys.KpiCurrent, Map("activeUsers" -> "7", "revenue" -> "12.5",
        "orders" -> "3", "errorRate" -> "0.0", "latency" -> "42",
        "updatedAt" -> "1000", "activeUsersTrend" -> "0.0",
        "revenueTrend" -> "2.5", "ordersTrend" -> "0.0",
        "errorRateTrend" -> "0.0", "latencyTrend" -> "0.0"))
      val metrics = get(port, "/api/metrics")
      assert(metrics.contains("\"activeUsers\":7"), metrics)
      assert(metrics.contains("\"revenue\":12.5"))
      assert(metrics.contains("\"latency\":42"))
      // traffic REVERSED (oldest first), activities as stored (newest first)
      kv.pushToList(Keys.TrafficTs, """{"t":1}""", 21)
      kv.pushToList(Keys.TrafficTs, """{"t":2}""", 21)
      assert(get(port, "/api/traffic") == """[{"t":1},{"t":2}]""")
      kv.pushToList(Keys.ActivityFeed, """{"a":1}""", 15)
      kv.pushToList(Keys.ActivityFeed, """{"a":2}""", 15)
      assert(get(port, "/api/activities") == """[{"a":2},{"a":1}]""")
      // alerts: stored rules array + typed summary in one object
      kv.writeJson(Keys.AlertRules, """[{"id":"alert_1","status":"ok"}]""")
      kv.writeHash(Keys.AlertSummary, Map("criticalCount" -> "1",
        "warningCount" -> "0", "healthyCount" -> "2",
        "criticalImpact" -> "Currently affecting 0% of users",
        "updatedAt" -> "1000"))
      val alerts = get(port, "/api/alerts")
      assert(alerts.startsWith("""{"rules":[{"id":"alert_1""""), alerts)
      assert(alerts.contains("\"criticalCount\":1"))
      kv.writeJson(Keys.PlatformBreakdown, """[{"name":"ios","value":3}]""")
      assert(get(port, "/api/platform") == """[{"name":"ios","value":3}]""")
    } finally server.stop(0)
  }

  test("SSE stream: snapshot on connect, then fetch-on-notify frames") {
    val kv = new InMemoryKvStore
    val server = Api.start(kv)
    val port = server.getAddress.getPort
    try {
      assert(Api.encodeEvent("metrics", """{"activeUsers":1}""") ==
        "event: metrics\ndata: {\"activeUsers\":1}\n\n")
      val conn = new java.net.URI(s"http://127.0.0.1:$port/api/stream")
        .toURL.openConnection()
      conn.setReadTimeout(15000)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(conn.getInputStream))
      def readFrame(): (String, String) = {
        var event: String = null; var data: String = null
        var line = in.readLine()
        while (line != null && (event == null || data == null)) {
          if (line.startsWith("event: ")) event = line.drop(7)
          if (line.startsWith("data: ")) data = line.drop(6)
          line = if (event != null && data != null) "" else in.readLine()
        }
        (event, data)
      }
      // snapshot-on-connect: a metrics frame with the current (default) shape
      val (e0, d0) = readFrame()
      assert(e0 == "metrics" && d0.contains("\"activeUsers\":0"), s"$e0 $d0")
      // a publish triggers a fetch-on-notify frame for the mapped event
      kv.writeJson(Keys.PlatformBreakdown, """[{"name":"web","value":9}]""",
        channel = Some(Keys.ChannelPlatform))
      val (e1, d1) = readFrame()
      assert(e1 == "platform" && d1 == """[{"name":"web","value":9}]""", s"$e1 $d1")
      in.close()
    } finally server.stop(0)
  }
}
