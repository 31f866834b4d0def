package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The serving shell (SURVEY.md §3.3): the reference's FastAPI REST
  * snapshot routes and SSE push stream re-expressed over the JDK's
  * built-in `HttpServer` — zero dependencies, same URL surface, same
  * payload shapes (reference: src/api/routes/snapshots.py:21-60, SSE
  * framing src/api/services/sse_manager.py:30-60 /
  * tests/api/test_sse.py:4-6).
  *
  * Push path parity: each KV publish channel maps to an SSE event name
  * (reference CHANNEL_TO_EVENT); on a publish, the CURRENT snapshot for
  * that event is fetched through the same reader the REST endpoint uses
  * and framed as `event: <name>\ndata: <json>\n\n` — the reference's
  * fetch-on-notify design, so a consumer never sees a payload the REST
  * surface wouldn't serve.
  *
  * Works over ANY [[KvStore]]: in-memory in tests, [[RespKvStore]]
  * against a real Redis in deploy — the HTTP layer only speaks to the
  * trait.
  */
object Api {

  /** channel → SSE event name (reference: api/config CHANNEL_TO_EVENT). */
  val ChannelToEvent: Map[String, String] = Map(
    Keys.ChannelKpi -> "metrics", Keys.ChannelTraffic -> "traffic",
    Keys.ChannelActivity -> "activity", Keys.ChannelRegions -> "regions",
    Keys.ChannelFlows -> "flows", Keys.ChannelAlerts -> "alert",
    Keys.ChannelPlatform -> "platform", Keys.ChannelHealth -> "health",
    Keys.ChannelGeo -> "geo")

  /** Snapshot JSON for one SSE event name — identical to the REST route. */
  def eventJson(kv: KvStore, event: String): String = event match {
    case "metrics" => Json.write(Serve.getMetrics(kv))
    case "traffic" => Serve.getTrafficJson(kv)
    case "activity" => Serve.getActivitiesJson(kv)
    case "regions" => Serve.getRegionsJson(kv)
    case "flows" => Serve.getFlowsJson(kv)
    case "alert" => Serve.getAlertsJson(kv)
    case "platform" => Serve.getPlatformJson(kv)
    case "health" => Json.write(Serve.getHealth(kv))
    case "geo" => Json.write(Serve.getGeo(kv))
    case other => throw new IllegalArgumentException(s"unknown event $other")
  }

  /** SSE frame format (reference: sse_manager.encode_event). */
  def encodeEvent(event: String, json: String): String =
    s"event: $event\ndata: $json\n\n"

  /** Start the server on `port` (0 = ephemeral); returns the handle —
    * `stop(0)` to shut down. */
  def start(kv: KvStore, port: Int = 0): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress(port), 0)

    // No `return` inside the handler lambda: in Scala 2.13 that compiles to
    // a NonLocalReturnControl targeting jsonRoute's already-popped frame — a
    // ControlThrowable (not an Exception) that HttpServer's dispatch won't
    // catch, killing the pooled thread on every 500. Branch on the Either
    // instead and fall through to a single response path.
    def jsonRoute(path: String)(body: () => String): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        val (status, bytes) =
          try (200, body().getBytes(UTF_8))
          catch { case e: Exception =>
            (500, Json.write(Map("error" -> e.getMessage)).getBytes(UTF_8))
          }
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })

    jsonRoute("/api/metrics")(() => eventJson(kv, "metrics"))
    jsonRoute("/api/traffic")(() => eventJson(kv, "traffic"))
    jsonRoute("/api/activities")(() => eventJson(kv, "activity"))
    jsonRoute("/api/regions")(() => eventJson(kv, "regions"))
    jsonRoute("/api/flows")(() => eventJson(kv, "flows"))
    jsonRoute("/api/alerts")(() => eventJson(kv, "alert"))
    jsonRoute("/api/platform")(() => eventJson(kv, "platform"))
    jsonRoute("/api/health")(() => eventJson(kv, "health"))
    jsonRoute("/api/geo")(() => eventJson(kv, "geo"))

    // SSE: subscribe to every channel; snapshot-on-connect for `metrics`
    // (the reference's WS manager sends a snapshot frame on connect),
    // then fetch-on-notify frames until the client hangs up.
    server.createContext("/api/stream", (ex: HttpExchange) => {
      ex.getResponseHeaders.set("Content-Type", "text/event-stream")
      ex.getResponseHeaders.set("Cache-Control", "no-cache")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      val queue = new LinkedBlockingQueue[String]()
      queue.put(encodeEvent("metrics", eventJson(kv, "metrics")))
      val sub = kv.subscribe(ChannelToEvent.keys.toSeq) { (ch, _) =>
        ChannelToEvent.get(ch).foreach { ev =>
          try queue.put(encodeEvent(ev, eventJson(kv, ev)))
          catch { case _: Exception => () }
        }
      }
      try {
        var open = true
        while (open) {
          val frame = queue.poll(15, TimeUnit.SECONDS)
          val payload = if (frame == null) ": keepalive\n\n" else frame
          try { out.write(payload.getBytes(UTF_8)); out.flush() }
          catch { case _: java.io.IOException => open = false }
        }
      } finally { sub.close(); ex.close() }
    })

    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      (r: Runnable) => { val t = new Thread(r, "graft-api"); t.setDaemon(true); t }))
    server.start()
    server
  }
}
