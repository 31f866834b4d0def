package graft.streaming

/** Serving-layer snapshot readers (SURVEY.md §3.3): the engine's output
  * contracts read back from the KV store, with the same string→number
  * re-parsing the reference's API service performs
  * (reference: src/api/services/redis_service.py:57-85, routes
  * src/api/routes/snapshots.py:21-23).
  *
  * The reference serves these over FastAPI + WebSocket; here the query
  * surface is the typed reader — any HTTP layer is a thin shell over it.
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

  /** GET /api/metrics parity: HGETALL the KPI hash and re-type. */
  def getMetrics(kv: KvStore): Map[String, Any] =
    kv.readHash(Keys.KpiCurrent).map { case (k, v) => k -> parseNumber(v) }

  /** Health snapshot read-back. */
  def getHealth(kv: KvStore): Map[String, Any] =
    kv.readHash("nexus:health:current").map { case (k, v) => k -> parseNumber(v) }

  /** Alert summary read-back. */
  def getAlertSummary(kv: KvStore): Map[String, Any] =
    kv.readHash(Keys.AlertSummary).map { case (k, v) => k -> parseNumber(v) }
}
