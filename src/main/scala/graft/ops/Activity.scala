package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Activity-feed enrichment (SURVEY.md §2 P8-P11, T2, F2) — the reference's
  * user-event → dashboard-activity projection
  * (reference: src/streaming/transforms/activity_enricher.py:31-54) and its
  * top-15-newest feed write (activity_enricher.py:19-26).
  */
object Activity {

  /** P8-P11/F2: the full enrichment projection. */
  def activityFeed(events: DataFrame): DataFrame = {
    val e = Synth.eventTime(events)
    // P8: event_type → action when-chain (reference maps checkout_complete/
    // login/add_to_cart/else; the fixture's types map purchase/signup/click).
    val action = when(col("event_type") === "purchase", lit("purchase"))
      .when(col("event_type") === "signup", lit("login"))
      .when(col("event_type") === "click", lit("cart"))
      .otherwise(lit("view"))
    e.select(
      concat(lit("evt_"), col("event_id").cast("string")).as("id"),
      // P10: display-name fallback.
      coalesce(Synth.displayName(col("user_id")),
        concat(lit("User "), col("user_id").cast("string"))).as("user"),
      action.as("action"),
      // P9: conditional amount.
      when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(null).cast("double")).as("amount"),
      // F2: ISO-8601 milliseconds timestamp ('XXX' renders Z for UTC).
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("timestamp"),
      // P11: city+country concat_ws, else region coalesce 'Unknown'.
      when(Synth.city(col("event_id")).isNotNull &&
          Synth.countryCode(col("event_id")).isNotNull,
        concat_ws(", ", Synth.city(col("event_id")), Synth.countryCode(col("event_id"))))
        .otherwise(coalesce(Synth.regionName(col("user_id")), lit("Unknown")))
        .as("location"),
      col("event_id"))
  }

  /** T2: top-15 newest activities. Timestamps are unique in the fixture but
    * event_id desc is kept as an explicit tiebreak so the limit is total-order
    * deterministic at any scale. Plans as TakeOrderedAndProject — per-partition
    * top-15, then a 15-row merge on the driver; no global sort.
    */
  def top15(events: DataFrame): DataFrame =
    activityFeed(events)
      .orderBy(col("timestamp").desc, col("event_id").desc)
      .limit(15)
      .drop("event_id")

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "activity_feed" -> ((s, d) =>
      activityFeed(Tables.events(s, d)).drop("event_id").orderBy(col("id"))),
    "activity_top15" -> ((s, d) => top15(Tables.events(s, d))),
  )

  private val feedSql: String = {
    val disp = Synth.displayNameSql("user_id")
    val city = Synth.citySql("event_id")
    val cc = Synth.countryCodeSql("event_id")
    val region = Synth.regionNameSql("user_id")
    s"""SELECT 'evt_' || event_id::VARCHAR AS id,
       |  coalesce($disp, 'User ' || user_id::VARCHAR) AS "user",
       |  CASE event_type WHEN 'purchase' THEN 'purchase' WHEN 'signup' THEN 'login'
       |    WHEN 'click' THEN 'cart' ELSE 'view' END AS action,
       |  CASE WHEN event_type = 'purchase' THEN value END AS amount,
       |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ') AS "timestamp",
       |  CASE WHEN ($city) IS NOT NULL AND ($cc) IS NOT NULL
       |    THEN concat_ws(', ', $city, $cc)
       |    ELSE coalesce($region, 'Unknown') END AS location,
       |  event_id
       |FROM events""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "activity_feed" ->
      s"""SELECT * EXCLUDE (event_id) FROM ($feedSql) ORDER BY id""",
    "activity_top15" ->
      s"""SELECT * EXCLUDE (event_id) FROM ($feedSql)
         |ORDER BY "timestamp" DESC, event_id DESC LIMIT 15""".stripMargin,
  )
}
