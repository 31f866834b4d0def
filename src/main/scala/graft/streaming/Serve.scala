package graft.streaming

/** Serving-layer snapshot readers (SURVEY.md §3.3): the engine's output
  * contracts read back from the KV store, with the same string→number
  * re-parsing and empty-store default shapes the reference's API service
  * performs (reference: src/api/services/redis_service.py:17-150, routes
  * src/api/routes/snapshots.py:21-60).
  *
  * The reference serves these over FastAPI + WebSocket/SSE; here the
  * query surface is the typed reader, and [[Api]] is the thin HTTP/SSE
  * shell over it.
  */
object Serve {

  /** `_parse_number` parity: ints stay ints, decimals become doubles,
    * non-numeric strings pass through (reference: redis_service.py
    * `_parse_number`, tested in tests/api/test_endpoints.py:4-11).
    */
  def parseNumber(s: String): Any =
    if (s == null || s.isEmpty) s
    else {
      val asLong = s.toLongOption
      if (asLong.isDefined) asLong.get
      else s.toDoubleOption.getOrElse(s)
    }

  private def num(m: Map[String, String], k: String, default: Any): Any =
    m.get(k).filter(_.nonEmpty).map(parseNumber).getOrElse(default)

  /** GET /api/metrics parity: HGETALL the KPI hash and re-type; an empty
    * store serves the reference's zeroed default shape. */
  def getMetrics(kv: KvStore): Map[String, Any] = {
    val m = kv.readHash(Keys.KpiCurrent)
    Map(
      "activeUsers" -> num(m, "activeUsers", 0L),
      "activeUsersTrend" -> num(m, "activeUsersTrend", 0.0),
      "revenue" -> num(m, "revenue", 0.0),
      "revenueTrend" -> num(m, "revenueTrend", 0.0),
      "orders" -> num(m, "orders", 0L),
      "ordersTrend" -> num(m, "ordersTrend", 0.0),
      "errorRate" -> num(m, "errorRate", 0.0),
      "errorRateTrend" -> num(m, "errorRateTrend", 0.0),
      "latency" -> num(m, "latency", 0L),
      "latencyTrend" -> num(m, "latencyTrend", 0.0),
      "updatedAt" -> num(m, "updatedAt", 0L))
  }

  /** GET /api/health parity (defaults = reference's DOWN shape). */
  def getHealth(kv: KvStore): Map[String, Any] = {
    val m = kv.readHash(Keys.HealthCurrent)
    if (m.isEmpty)
      Map("cpu_centi" -> 0L, "memory_centi" -> 0L,
        "apiClusterStatus" -> "DOWN", "apiClusterScore" -> 0.0,
        "updatedAt" -> 0L)
    else m.map { case (k, v) => k -> parseNumber(v) }
  }

  /** GET /api/geo parity. */
  def getGeo(kv: KvStore): Map[String, Any] = {
    val m = kv.readHash(Keys.GeoHeader)
    if (m.isEmpty)
      Map("uptime" -> 0.0, "globalLoad" -> "0 B/S", "globalLoadBytes" -> 0L,
        "engineVersion" -> "V4-Orbit", "protocolStatus" -> "Unknown",
        "updatedAt" -> 0L)
    else m.map { case (k, v) => k -> parseNumber(v) }
  }

  /** Alert summary read-back (hash half of GET /api/alerts). */
  def getAlertSummary(kv: KvStore): Map[String, Any] = {
    val m = kv.readHash(Keys.AlertSummary)
    Map(
      "criticalCount" -> num(m, "criticalCount", 0L),
      "warningCount" -> num(m, "warningCount", 0L),
      "healthyCount" -> num(m, "healthyCount", 0L),
      "criticalImpact" -> m.getOrElse("criticalImpact",
        "Currently affecting 0% of users"),
      "updatedAt" -> num(m, "updatedAt", 0L))
  }

  /** GET /api/alerts parity: `{"rules": [...], "summary": {...}}`. */
  def getAlertsJson(kv: KvStore): String =
    s"""{"rules":${kv.readJson(Keys.AlertRules).getOrElse("[]")},""" +
      s""""summary":${Json.write(getAlertSummary(kv))}}"""

  /** GET /api/traffic parity: the capped list REVERSED (oldest first). */
  def getTrafficJson(kv: KvStore): String =
    kv.readList(Keys.TrafficTs, 21).reverse.mkString("[", ",", "]")

  /** GET /api/activities parity: list head = newest, as stored. */
  def getActivitiesJson(kv: KvStore): String =
    kv.readList(Keys.ActivityFeed, 15).mkString("[", ",", "]")

  /** GET /api/regions, /api/flows, /api/platform: stored JSON or []. */
  def getRegionsJson(kv: KvStore): String =
    kv.readJson(Keys.RegionsCurrent).getOrElse("[]")
  def getFlowsJson(kv: KvStore): String =
    kv.readJson(Keys.FlowsCurrent).getOrElse("[]")
  def getPlatformJson(kv: KvStore): String =
    kv.readJson(Keys.PlatformBreakdown).getOrElse("[]")
}

/** Minimal JSON writer for the serving payloads (maps of scalars, lists,
  * raw pre-encoded fragments) — the engine ships no JSON library and the
  * payload grammar here is closed. */
object Json {
  /** A fragment that is ALREADY JSON-encoded (stored payload strings). */
  final case class Raw(json: String)

  def write(v: Any): String = v match {
    case null => "null"
    case Raw(j) => j
    case s: String =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => b.toString
    case n: Long => n.toString
    case n: Int => n.toString
    case d: Double =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
        s"${d.toLong}.0"
      else d.toString
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"${write(k)}:${write(x)}" }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(write).mkString("[", ",", "]")
    case other => write(other.toString)
  }
}
