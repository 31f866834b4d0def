package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Alert evaluation (SURVEY.md §2 P13, U3, A10, F2) — threshold
  * classification per rule with a union-based rule fan-out
  * (reference: src/streaming/transforms/alert_evaluator.py:43-78; rule
  * definitions src/streaming/config.py:84-110).
  */
object Alerts {

  /** One rule of the reference's ALERT_RULES config
    * (reference: config.py:84-110). `metricColumn=None` is the db-cpu rule
    * whose source isn't wired yet — constant 'pending', exactly like the
    * reference.
    */
  final case class Rule(id: String, name: String, severity: String,
      metric: String, threshold: Double, frequency: String,
      metricColumn: Option[String])

  val rules: Seq[Rule] = Seq(
    Rule("alert_1", "High Latency p99 > 200ms", "critical",
      "system.latency.p99", 200.0, "1m", Some("latency")),
    Rule("alert_2", "Checkout Error Rate > 1%", "critical",
      "checkout.error_rate", 1.0, "30s", Some("errorRate")),
    Rule("alert_3", "Database CPU Utilization", "warning",
      "db.cpu.percent", 80.0, "5m", None))

  /** P13/U3/F2: project one stream per rule off the KPI frame, then union
    * (reference: alert_evaluator.py:43-78). `from_unixtime` renders
    * lastEvaluated exactly like the reference (F2).
    */
  def alertFrame(kpis: DataFrame): DataFrame = {
    val ruleFrames = rules.map { r =>
      val (currentValue, status): (Column, Column) = r.metricColumn match {
        case None => (lit(0.0), lit("pending"))
        case Some(c) => (col(c).cast("double"),
          when(col(c) >= lit(r.threshold), lit("firing")).otherwise(lit("ok")))
      }
      kpis.select(
        lit(r.id).as("id"),
        lit(r.name).as("name"),
        status.as("status"),
        lit(r.severity).as("severity"),
        lit(r.metric).as("metric"),
        currentValue.as("currentValue"),
        lit(r.threshold).as("threshold"),
        col("updatedAt").cast("long").as("updatedAt"),
        from_unixtime(col("updatedAt") / 1000).as("lastEvaluated"),
        lit(r.frequency).as("frequency"))
    }
    ruleFrames.reduce(_ unionByName _)
  }

  /** A10: summary counts by severity/status — the driver-side Python fold of
    * the reference (alert_evaluator.py:27-37) promoted into the plan as
    * conditional aggregation, grouped per evaluation instant.
    */
  def alertSummary(alerts: DataFrame): DataFrame =
    alerts.groupBy(col("updatedAt"))
      .agg(
        sum(when(col("severity") === "critical" && col("status") =!= "ok", 1)
          .otherwise(0)).cast("long").as("criticalCount"),
        sum(when(col("severity") === "warning" && col("status") =!= "ok", 1)
          .otherwise(0)).cast("long").as("warningCount"),
        sum(when(col("status") === "ok", 1).otherwise(0)).cast("long").as("healthyCount"))
      .select(col("updatedAt"), col("criticalCount"), col("warningCount"),
        col("healthyCount"),
        lit("Currently affecting 0% of users").as("criticalImpact"))
      .orderBy(col("updatedAt"))

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The rule fan-out references the KPI frame once per rule. A lazy
    // persist() did NOT achieve "aggregate once": the three union arms
    // materialize as CONCURRENT stage jobs, and all three computed the
    // not-yet-cached KPI plan from scratch (profiled: 3 × ~2 s identical
    // scan+window stages at sf0.1). The eager localCheckpoint runs the
    // aggregation exactly once before the fan-out; the checkpointed frame
    // is windows-grain tiny at any corpus size.
    "alert_rules" -> ((s, d) => alertFrame(
      Frames.kpiFrame(Tables.events(s, d)).localCheckpoint(true))
      .orderBy(col("updatedAt"), col("id"))),
    "alert_summary" -> ((s, d) =>
      alertSummary(alertFrame(
        Frames.kpiFrame(Tables.events(s, d)).localCheckpoint(true)))),
  )

  /** Oracle: re-derive the KPI frame CTE (same as Frames.kpi_sliding), then
    * the rule fan-out as three SELECTs unioned.
    */
  private val kpiCte: String =
    """WITH n AS (
      |  SELECT ts AS event_time, 0 AS asc_, value AS rev, 1 AS ord, 0 AS req, 0 AS err, NULL::DOUBLE AS lat
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT ts, 1, 0.0, 0, 0, 0, NULL FROM events WHERE event_type = 'signup'
      |  UNION ALL
      |  SELECT ts, 0, 0.0, 0, 1, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END, value * 100
      |  FROM events WHERE event_type IN ('click','view','error')
      |), w AS (
      |  SELECT (((epoch_us(event_time) // 1000000) // 600) * 600 - 600 * g.g) AS wstart, n.*
      |  FROM n, generate_series(0, 2) g(g)
      |), kpi AS (
      |  SELECT (wstart + 1800) * 1000 AS updatedAt,
      |    round(sum(err) / greatest(sum(req), 1) * 100, 2) AS errorRate,
      |    coalesce(floor(quantile_cont(lat, 0.5)), 0)::BIGINT AS latency
      |  FROM w GROUP BY wstart
      |), alerts AS (
      |  SELECT 'alert_1' AS id, 'High Latency p99 > 200ms' AS name,
      |    CASE WHEN latency >= 200.0 THEN 'firing' ELSE 'ok' END AS status,
      |    'critical' AS severity, 'system.latency.p99' AS metric,
      |    latency::DOUBLE AS "currentValue", 200.0 AS threshold,
      |    updatedAt AS "updatedAt",
      |    strftime(make_timestamp((updatedAt // 1000) * 1000000), '%Y-%m-%d %H:%M:%S') AS "lastEvaluated",
      |    '1m' AS frequency
      |  FROM kpi
      |  UNION ALL
      |  SELECT 'alert_2', 'Checkout Error Rate > 1%',
      |    CASE WHEN errorRate >= 1.0 THEN 'firing' ELSE 'ok' END,
      |    'critical', 'checkout.error_rate', errorRate, 1.0, updatedAt,
      |    strftime(make_timestamp((updatedAt // 1000) * 1000000), '%Y-%m-%d %H:%M:%S'), '30s'
      |  FROM kpi
      |  UNION ALL
      |  SELECT 'alert_3', 'Database CPU Utilization', 'pending',
      |    'warning', 'db.cpu.percent', 0.0, 80.0, updatedAt,
      |    strftime(make_timestamp((updatedAt // 1000) * 1000000), '%Y-%m-%d %H:%M:%S'), '5m'
      |  FROM kpi
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "alert_rules" ->
      s"""$kpiCte
         |SELECT * FROM alerts ORDER BY "updatedAt", id""".stripMargin,
    "alert_summary" ->
      s"""$kpiCte
         |SELECT "updatedAt",
         |  sum(CASE WHEN severity = 'critical' AND status <> 'ok' THEN 1 ELSE 0 END)::BIGINT AS "criticalCount",
         |  sum(CASE WHEN severity = 'warning' AND status <> 'ok' THEN 1 ELSE 0 END)::BIGINT AS "warningCount",
         |  sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END)::BIGINT AS "healthyCount",
         |  'Currently affecting 0% of users' AS "criticalImpact"
         |FROM alerts GROUP BY "updatedAt" ORDER BY "updatedAt"""".stripMargin,
  )
}
